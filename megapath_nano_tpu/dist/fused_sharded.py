"""Production multi-chip map path: the fused seed→chain→extend step running
per index shard under shard_map, merged with an ICI all_gather.

This is the TPU-native equivalent of the reference's minimap2 index-batch
streaming (reference: bin/lib/aligner.py:211-217 — targets cat'd through a
FIFO in chunks, minimap2 -I batches the index, the host merges per-read hits
across passes; SURVEY §2.7). Here:

  - the minimizer index is partitioned by target sequence across S shards
    along the "shard" mesh axis; each device holds its shard's sorted hash
    planes + packed bases (device-resident — only the 2-bit packed reads
    cross the host link)
  - reads are DATA-PARALLEL over the "data" mesh axis: a slice is split
    into D contiguous blocks, block d replicated across data-row d's S
    shard devices; each device runs the SAME fused dispatch as the
    single-chip device-seeded path (align/device_seed.py seeding +
    align/pipeline._fused_tail) on (its read block × its index shard)
  - per-shard row blocks (compacted uint16 stats rows) are merged with
    jax.lax.all_gather over the "shard" mesh axis — one collective per
    data row, one host fetch regardless of D × S
  - the host applies the global per-read top-K chain gate over the union
    (each shard kept its local top-K, a superset of the global top-K) and
    the standard multi-locus selection/collect (fused_collect_np), so the
    output AlignList is field-identical to the single-index mapper's

Known divergence (shared with the reference's own -I batching): per-shard
max_occ filtering sees per-shard key occupancy, so a minimizer repetitive
globally but rare per shard may seed extra candidates.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from megapath_nano_tpu.align.pipeline import (AlignParams, F_CHAIN, F_KEEP,
                                              F_RID, F_SEQ, FUSED_COLS,
                                              SequenceMeta, _fused_tail,
                                              _pack_counts_row, _pack_reads2,
                                              _run_counts,
                                              _unpack_counts_row,
                                              _unpack_reads, AlignList,
                                              fused_collect_np)
from megapath_nano_tpu.index.minimizer import MinimizerIndex

_HASH_PAD = np.int32(1 << 30)   # > any 30-bit minimizer hash (k <= 15)


@dataclass
class ShardedIndexPlanes:
    """Host container of per-shard device-index planes, padded to equal
    shapes and stacked on a leading shard axis."""

    keys32: np.ndarray        # (S, K) int32 sorted per shard (pad 2**30)
    pos_t: np.ndarray         # (S, K) int32 within-sequence k-mer end
    pos_ss: np.ndarray        # (S, K) int32 local seq_id << 1 | strand
    seq_data: np.ndarray      # (S, T) int8, pad 5 (+ 2**15 sentinel tail)
    seq_offsets: np.ndarray   # (S, N+1) int32 local concat offsets
    seq_lengths: np.ndarray   # (S, N) int32
    seq_global: np.ndarray    # (S, N) int32 local -> global seq id (pad -1)
    k: int
    w: int
    seq_bits: int             # max local seq-id bit width over shards
    global_seq_names: list[str]
    global_seq_lengths: np.ndarray
    local_indexes: list = field(default_factory=list)  # per-shard host index
    shard_of_seq: np.ndarray | None = None             # (n_global,) int32

    @property
    def n_shards(self) -> int:
        return self.keys32.shape[0]

    def save(self, path: str) -> None:
        """On-disk shard format: one npz of the stacked device planes + a
        json sidecar (names, k/w). Loading restores a mapper-ready object
        without re-sketching the reference."""
        _save_planes(self, path)

    @staticmethod
    def load(path: str) -> "ShardedIndexPlanes":
        return _load_planes(path)

    def local_index(self, sh: int) -> MinimizerIndex:
        """Host MinimizerIndex of shard sh (for the exact overflow
        fallback); rebuilt from the shard planes when the object was
        loaded from disk."""
        if self.local_indexes:
            return self.local_indexes[sh]
        if not hasattr(self, "_rebuilt"):
            self._rebuilt = {}
        if sh not in self._rebuilt:
            gids = self.seq_global[sh]
            seqs, names = [], []
            for li, g in enumerate(gids):
                if g < 0:
                    break
                s0 = int(self.seq_offsets[sh][li])
                s1 = s0 + int(self.seq_lengths[sh][li])
                seqs.append(self.seq_data[sh][s0:s1])
                names.append(self.global_seq_names[int(g)])
            if not seqs:
                seqs, names = [np.zeros(0, np.int8)], ["__empty__"]
            self._rebuilt[sh] = MinimizerIndex.build(seqs, names, k=self.k,
                                                     w=self.w)
        return self._rebuilt[sh]

    @staticmethod
    def build(sequences: list[np.ndarray], seq_names: list[str] | None,
              n_shards: int, *, k: int = 15, w: int = 10,
              assign: np.ndarray | None = None) -> "ShardedIndexPlanes":
        """Partition sequences across shards (default: greedy
        longest-first balance by total bp) and build per-shard planes."""
        assert k <= 15, "device planes need 30-bit hashes (k <= 15)"
        n = len(sequences)
        names = seq_names or [f"seq{i}" for i in range(n)]
        if assign is None:
            order = np.argsort([-len(s) for s in sequences], kind="stable")
            load = np.zeros(n_shards, np.int64)
            assign = np.zeros(n, np.int32)
            for i in order:
                sh = int(np.argmin(load))
                assign[i] = sh
                load[sh] += len(sequences[i])
        assign = np.asarray(assign, np.int32)

        per_shard = [[] for _ in range(n_shards)]
        for i in range(n):
            per_shard[assign[i]].append(i)

        locals_, tabs = [], []
        for sh in range(n_shards):
            gids = per_shard[sh]
            if gids:
                idx = MinimizerIndex.build(
                    [sequences[i] for i in gids],
                    [names[i] for i in gids], k=k, w=w)
            else:
                idx = MinimizerIndex.build(
                    [np.zeros(0, np.int8)], ["__empty__"], k=k, w=w)
                gids = [-1]
            seq_id_l, pos_l, strand_l = idx.unpack(idx.positions)
            keys32 = idx.keys.astype(np.int64)
            assert keys32.size == 0 or keys32.max() < 2 ** 30
            tabs.append((keys32.astype(np.int32), pos_l.astype(np.int32),
                         ((seq_id_l.astype(np.int32) << 1)
                          | strand_l).astype(np.int32), idx, gids))
            locals_.append(idx)

        K = max(1, max(len(t[0]) for t in tabs))
        K = int(np.ceil(K / 128) * 128)
        T = max(1, max(t[3].seq_data.size for t in tabs))
        T = int(np.ceil(T / 128) * 128) + 2 ** 15   # sentinel window tail
        N = max(len(t[4]) for t in tabs)

        keys = np.full((n_shards, K), _HASH_PAD, np.int32)
        pos_t = np.zeros((n_shards, K), np.int32)
        pos_ss = np.zeros((n_shards, K), np.int32)
        seq_data = np.full((n_shards, T), 5, np.int8)
        seq_off = np.zeros((n_shards, N + 1), np.int32)
        seq_len = np.zeros((n_shards, N), np.int32)
        seq_glob = np.full((n_shards, N), -1, np.int32)
        for sh, (kk, pt, ss, idx, gids) in enumerate(tabs):
            keys[sh, :len(kk)] = kk
            pos_t[sh, :len(pt)] = pt
            pos_ss[sh, :len(ss)] = ss
            seq_data[sh, :idx.seq_data.size] = idx.seq_data
            nl = len(idx.seq_lengths)
            seq_off[sh, :nl + 1] = idx.seq_offsets.astype(np.int32)
            seq_off[sh, nl + 1:] = np.int32(idx.seq_offsets[-1])
            seq_len[sh, :nl] = idx.seq_lengths.astype(np.int32)
            seq_glob[sh, :len(gids)] = gids
        shard_of_seq = assign.copy()
        return ShardedIndexPlanes(
            keys32=keys, pos_t=pos_t, pos_ss=pos_ss, seq_data=seq_data,
            seq_offsets=seq_off, seq_lengths=seq_len, seq_global=seq_glob,
            k=k, w=w,
            seq_bits=max(1, (max(N - 1, 1)).bit_length()),
            global_seq_names=list(names),
            global_seq_lengths=np.array([len(s) for s in sequences],
                                        np.int64),
            local_indexes=locals_, shard_of_seq=shard_of_seq)


def _save_planes(planes: "ShardedIndexPlanes", path: str) -> None:
    import json
    import os

    os.makedirs(path, exist_ok=True)
    np.savez_compressed(
        os.path.join(path, "planes.npz"),
        keys32=planes.keys32, pos_t=planes.pos_t, pos_ss=planes.pos_ss,
        seq_data=planes.seq_data, seq_offsets=planes.seq_offsets,
        seq_lengths=planes.seq_lengths, seq_global=planes.seq_global,
        global_seq_lengths=planes.global_seq_lengths,
        shard_of_seq=planes.shard_of_seq)
    with open(os.path.join(path, "planes.json"), "w") as f:
        json.dump({"k": planes.k, "w": planes.w,
                   "seq_bits": planes.seq_bits,
                   "global_seq_names": planes.global_seq_names}, f)


def _load_planes(path: str) -> "ShardedIndexPlanes":
    import json
    import os

    z = np.load(os.path.join(path, "planes.npz"))
    with open(os.path.join(path, "planes.json")) as f:
        meta = json.load(f)
    return ShardedIndexPlanes(
        keys32=z["keys32"], pos_t=z["pos_t"], pos_ss=z["pos_ss"],
        seq_data=z["seq_data"], seq_offsets=z["seq_offsets"],
        seq_lengths=z["seq_lengths"], seq_global=z["seq_global"],
        k=int(meta["k"]), w=int(meta["w"]),
        seq_bits=int(meta["seq_bits"]),
        global_seq_names=list(meta["global_seq_names"]),
        global_seq_lengths=z["global_seq_lengths"],
        local_indexes=[],            # host fallback indexes not persisted;
        #                              rebuilt lazily from the shard planes
        shard_of_seq=z["shard_of_seq"])


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "k", "w", "max_occ", "min_group_anchors",
                     "gap_break", "cap", "seq_bits", "lut_bits", "n_bisect",
                     "wtot_max", "a_max",
                     "g_max", "out_cap", "q_max", "t_max", "band", "match",
                     "mismatch", "gap_open", "gap_extend", "batch_tile",
                     "backend", "min_chain_score", "max_per_read",
                     "window_pad"))
def _sharded_fused_dispatch(keys32, pos_t, ss16, lut2, runcnt, seq_data,
                            seq_off,
                            seq_len, packed2, exc_rid, exc_pos, qlens, *,
                            mesh, k, w, max_occ, min_group_anchors,
                            gap_break, cap, seq_bits, lut_bits, n_bisect,
                            wtot_max, a_max,
                            g_max, out_cap, q_max, t_max, band, match,
                            mismatch, gap_open, gap_extend, batch_tile,
                            backend, min_chain_score, max_per_read,
                            window_pad):
    """One multi-device dispatch over the full (data × shard) mesh: reads
    are split into D blocks along the "data" axis, the index into S shards
    along the "shard" axis; each device runs the fused seed→chain→extend
    step on (its read block × its index shard), and per-shard row blocks
    merge with all_gather over "shard" (ICI). Returns
    (D, S, out_cap+1, FUSED_COLS) uint16 — out_cap compacted stats rows +
    a counts row per (data block, shard).

    Reads arrive pre-blocked on a leading data axis: packed2 (D, nd, nb),
    exc_rid/exc_pos (D, ep), qlens (D, nd) — read ids inside a block are
    block-local; the host offsets them by d * nd after the fetch."""
    from megapath_nano_tpu.align.device_seed import build_groups_device

    def local_step(keys32, pos_t, ss16, lut2, runcnt, seq_data, seq_off,
                   seq_len, packed2, exc_rid, exc_pos, qlens):
        packed2, exc_rid, exc_pos, qlens = (
            packed2[0], exc_rid[0], exc_pos[0], qlens[0])
        codes = _unpack_reads(packed2, exc_rid, exc_pos)
        qg, tg, cnt, rid, seqid, strand, t_base, dcounts = \
            build_groups_device(
                codes, qlens, keys32[0], pos_t[0], ss16[0], lut2[0],
                runcnt[0], k=k, w=w,
                max_occ=max_occ, min_group_anchors=min_group_anchors,
                gap_break=gap_break, cap=cap, seq_bits=seq_bits,
                lut_bits=lut_bits, n_bisect=n_bisect,
                wtot_max=wtot_max, a_max=a_max, g_max=g_max)
        out, n_keep, minrid_out = _fused_tail(
            codes, qlens, qg, tg, cnt, rid, seqid, strand, t_base,
            seq_data[0], seq_off[0], seq_len[0], k=k, q_max=q_max,
            t_max=t_max, band=band, match=match, mismatch=mismatch,
            gap_open=gap_open, gap_extend=gap_extend,
            batch_tile=batch_tile, backend=backend,
            min_chain_score=min_chain_score, max_per_read=max_per_read,
            window_pad=window_pad, ext_cap=out_cap)
        minrid = jnp.minimum(dcounts[3], minrid_out)
        counts = jnp.concatenate([dcounts[:3], n_keep[None], minrid[None]])
        rows = jnp.concatenate([out, _pack_counts_row(counts)], axis=0)
        # ICI merge: every device in a data row ends with all shards' row
        # blocks for ITS read block
        return jax.lax.all_gather(rows, "shard")[None]

    return shard_map(
        local_step, mesh=mesh,
        in_specs=(P("shard", None), P("shard", None), P("shard", None),
                  P("shard", None, None),
                  P("shard", None), P("shard", None), P("shard", None),
                  P("shard", None),
                  P("data", None, None), P("data", None), P("data", None),
                  P("data", None)),
        out_specs=P("data"),
        check_vma=False,
    )(keys32, pos_t, ss16, lut2, runcnt, seq_data, seq_off, seq_len,
      packed2, exc_rid, exc_pos, qlens)


class ShardMapAligner:
    """Multi-chip mapper: same AlignList output as MinimizerAligner, index
    partitioned across a 'shard' mesh axis. PAF mode only (the taxon spine's
    mode; base-exact CIGAR emit stays a single-chip/host concern)."""

    def __init__(self, planes: ShardedIndexPlanes, mesh,
                 meta: SequenceMeta | None = None,
                 params: AlignParams | None = None):
        assert mesh.shape["shard"] == planes.n_shards
        self.planes = planes
        self.mesh = mesh
        self.params = params or AlignParams()
        self.meta = meta or SequenceMeta.single_assembly_per_sequence(
            planes.global_seq_names)
        self._dev = None          # device-put shard arrays (lazy)
        self._fallback = [None] * planes.n_shards
        # per-(data-block, shard) overflow telemetry (partial-redo rate)
        self.overflow_stats = {"blocks": 0, "overflow_blocks": 0,
                               "reads_redone": 0}
        # adaptive cap scales (see MinimizerAligner._devseed_cutoff)
        self._cap_scales = {"w": 1.0, "a": 1.0, "g": 1.0, "out": 1.0}

    def _device_arrays(self):
        if self._dev is None:
            sh = NamedSharding(self.mesh, P("shard", None))
            p = self.planes
            # per-shard bucket LUT + bisect depth + runcnt plane (see
            # MinimizerAligner._device_index_planes); shards share one
            # executable, so n_bisect is the max over shards (extra rounds
            # are no-ops once the bisection range is empty). LUT sized to
            # the max per-shard key count (pipeline._lut_bits_for policy).
            from megapath_nano_tpu.align.pipeline import _lut_bits_for

            n_keys = int(np.count_nonzero(p.keys32 != _HASH_PAD, axis=1)
                         .max()) if p.keys32.size else 0
            lut_bits = _lut_bits_for(n_keys, p.k)
            shift = 2 * p.k - lut_bits
            bounds = (np.arange((1 << lut_bits) + 1, dtype=np.int64)
                      << shift)
            luts = np.stack([
                np.searchsorted(p.keys32[s].astype(np.int64), bounds)
                .astype(np.int32) for s in range(p.n_shards)])
            max_bucket = int(np.diff(luts, axis=1).max()) if luts.size else 0
            self._lut_meta = (lut_bits, max(1, max_bucket.bit_length()))
            lut2s = np.ascontiguousarray(
                np.stack([luts[:, :-1], luts[:, 1:]], axis=2))
            runcnts = np.stack([
                _run_counts(p.keys32[s].astype(np.int64))
                for s in range(p.n_shards)])
            ss16 = p.pos_ss.astype(np.uint16)
            # device reference is 4-bit packed (align/pipeline._pack_seq4):
            # halves the dominant HBM plane so more shards fit per chip
            T = p.seq_data.shape[1]
            if T % 2:
                seqp = np.concatenate(
                    [p.seq_data, np.full((p.n_shards, 1), 5, np.int8)],
                    axis=1)
            else:
                seqp = p.seq_data
            u = seqp.astype(np.uint8)
            seq4 = ((u[:, 0::2] << 4) | u[:, 1::2]).astype(np.uint8)
            self._dev = tuple(
                jax.device_put(a, sh if a.ndim == 2 else
                               NamedSharding(self.mesh,
                                             P("shard", None, None)))
                for a in (p.keys32, p.pos_t.astype(np.int32), ss16,
                          lut2s, runcnts,
                          seq4,
                          p.seq_offsets, p.seq_lengths))
        return self._dev

    def _caps(self, slice_n: int, read_max: int):
        from megapath_nano_tpu.align.pipeline import MinimizerAligner

        # per-shard hash-space occupancy (spurious hits per query hash);
        # the dense-index anchor sizing lives in _devseed_caps, adaptively
        # scaled on overflow like the single-chip mapper
        p = self.planes
        n_pos = int(np.count_nonzero(p.keys32 != _HASH_PAD, axis=1).max()) \
            if p.keys32.size else 0
        occ = n_pos / float(4 ** p.k)
        wtot_max, a_max, g_max = MinimizerAligner._devseed_caps(
            slice_n, read_max, occ)
        sc = self._cap_scales

        def pow2up(x, lo):
            b = lo
            while b < x:
                b *= 2
            return b

        if sc["w"] > 1.0:
            wtot_max = pow2up(int(wtot_max * sc["w"]), wtot_max)
        if sc["a"] > 1.0:
            gran = max(wtot_max // 16, 4096)
            a_max = -(-int(a_max * sc["a"]) // gran) * gran
        if sc["g"] > 1.0:
            g_max = pow2up(int(g_max * sc["g"]), g_max)
        out_cap = 2048
        while out_cap < (self.params.devseed_out_per_read * sc["out"]
                         * slice_n):
            out_cap *= 2
        return wtot_max, a_max, g_max, min(out_cap, g_max)

    def _bump_scales(self, counts, caps):
        wtot_max, a_max, g_max, out_cap = caps
        sc = self._cap_scales
        for key, seen, cap in (("w", counts[0], wtot_max),
                               ("a", counts[1], a_max),
                               ("g", counts[2], g_max),
                               ("out", counts[3], out_cap)):
            if seen > cap:
                sc[key] = min(8.0, sc[key] * max(
                    1.25, 1.2 * float(seen) / float(cap)))

    def _shard_fallback_rows(self, sh: int, reads, read_max, band):
        """Exact host-seeded dispatch against shard sh's local index —
        run when the shard's device-seeded caps overflowed."""
        from megapath_nano_tpu.align.anchors import collect_anchors
        from megapath_nano_tpu.align.pipeline import MinimizerAligner

        if self._fallback[sh] is None:
            self._fallback[sh] = MinimizerAligner(
                self.planes.local_index(sh), params=self.params)
        al = self._fallback[sh]
        groups = collect_anchors(al.index, reads, max_occ=self.params.max_occ,
                                 min_group_anchors=(
                                     self.params.min_group_anchors),
                                 gap_break=self.params.gap_break)
        if groups.n_groups == 0:
            return np.zeros((0, FUSED_COLS), np.uint16)
        fut, _ctx = al._fused_submit(reads, groups, read_max, _pow2,
                                     lambda qm: band,
                                     n_rows=_pow2(len(reads)))
        blk = np.asarray(fut)
        return blk[:-1]

    def map_reads(self, reads: list[np.ndarray],
                  read_names: list[str] | None = None,
                  slice_size: int | None = 2048,
                  emit_cigars: bool = False) -> AlignList:
        assert not emit_cigars, "shard_map path is PAF-mode only"
        if not reads:
            return AlignList.empty(self.planes.global_seq_names,
                                   self.meta.assembly_names, read_names or [])
        step = slice_size or len(reads)
        parts = []
        for s in range(0, len(reads), step):
            parts.append(self._map_slice(reads[s:s + step], s))
        data = np.concatenate(parts) if len(parts) > 1 else parts[0]
        order = np.lexsort((data["sequence_from"], data["sequence_id"],
                            data["read_id"]))
        return AlignList(data[order], list(self.planes.global_seq_names),
                         list(self.meta.assembly_names), read_names or [],
                         None)

    def _map_slice(self, reads, id_base) -> np.ndarray:
        p = self.params
        planes = self.planes
        n_data = self.mesh.shape.get("data", 1)
        # read block per data row (data-parallel axis); every block padded
        # to nd rows so the stacked (D, nd, ...) arrays are rectangular
        nd = _pow2((len(reads) + n_data - 1) // n_data, 256)
        read_max = _pow2(max(len(r) for r in reads), 256)
        band = p.band if p.band is not None else (
            128 if read_max <= 2048 else (256 if read_max <= 8192 else 512))
        assert read_max + band < 2 ** 15, "fused gate: reads too long"
        t_max = -(-(read_max + band) // 256) * 256
        wtot_max, a_max, g_max, out_cap = self._caps(nd, read_max)

        blocks_in = [reads[d * nd: (d + 1) * nd] for d in range(n_data)]
        packs = [_pack_reads2(b, read_max, n_rows=nd) for b in blocks_in]
        ep = max(pk[1].shape[0] for pk in packs)
        packed2 = np.stack([pk[0] for pk in packs])
        exc_rid = np.full((n_data, ep), nd, np.int32)   # pad rid nd: dropped
        exc_pos = np.zeros((n_data, ep), np.int32)
        qlens_a = np.zeros((n_data, nd), np.int32)
        for d, (pk, b) in enumerate(zip(packs, blocks_in)):
            exc_rid[d, :pk[1].shape[0]] = pk[1]
            exc_pos[d, :pk[2].shape[0]] = pk[2]
            qlens_a[d, :len(b)] = [len(r) for r in b]
        dev = self._device_arrays()
        args = [jax.device_put(x, NamedSharding(
                    self.mesh, P("data", *([None] * (x.ndim - 1)))))
                for x in (packed2, exc_rid, exc_pos, qlens_a)]
        lut_bits, n_bisect = self._lut_meta
        blocks = np.asarray(_sharded_fused_dispatch(
            *dev, *args, mesh=self.mesh, k=planes.k, w=planes.w,
            max_occ=p.max_occ, min_group_anchors=p.min_group_anchors,
            gap_break=p.gap_break, cap=p.fused_anchor_cap,
            seq_bits=planes.seq_bits,
            lut_bits=lut_bits, n_bisect=n_bisect,
            wtot_max=wtot_max, a_max=a_max, g_max=g_max, out_cap=out_cap,
            q_max=read_max, t_max=t_max, band=band, match=p.match,
            mismatch=p.mismatch, gap_open=p.gap_open,
            gap_extend=p.gap_extend, batch_tile=128, backend=p.backend,
            min_chain_score=p.min_chain_score,
            max_per_read=p.max_alignments_per_read,
            window_pad=p.window_pad))

        shard_rows = []
        for d in range(n_data):
            for sh in range(planes.n_shards):
                counts = _unpack_counts_row(blocks[d, sh, -1])
                n_real = len(blocks_in[d])
                cutoff = min(int(counts[4]), n_real)
                # keep rows only, with local -> global sequence id remap and
                # block-local -> slice-local read id offset (rows widen to
                # int64 here, so neither is uint16-bounded)
                r = blocks[d, sh, :-1].astype(np.int64)
                r = r[r[:, F_KEEP] == 1]
                if cutoff < n_real:
                    # partial redo: device rows below the cutoff are exact;
                    # only the truncated read-id suffix re-runs host-seeded
                    # against this shard's local index
                    self.overflow_stats["overflow_blocks"] += 1
                    self.overflow_stats["reads_redone"] += n_real - cutoff
                    self._bump_scales(counts,
                                      (wtot_max, a_max, g_max, out_cap))
                    r = r[r[:, F_RID] < cutoff]
                    fb = self._shard_fallback_rows(
                        sh, blocks_in[d][cutoff:], read_max,
                        band).astype(np.int64)
                    fb = fb[fb[:, F_KEEP] == 1]
                    fb[:, F_RID] += cutoff
                    r = np.concatenate([r, fb]) if len(fb) else r
                self.overflow_stats["blocks"] += 1
                r[:, F_SEQ] = planes.seq_global[sh][r[:, F_SEQ]]
                r[:, F_RID] += d * nd
                shard_rows.append(r)
        arr = np.concatenate(shard_rows) if shard_rows else \
            np.zeros((0, FUSED_COLS), np.int64)

        # global per-read top-K chain gate over the shard union (each shard
        # kept its local top-K; the union is a superset of the global top-K
        # — same merge rule as the reference's index-batch passes)
        if len(arr):
            order = np.lexsort((np.arange(len(arr)), -arr[:, F_CHAIN],
                                arr[:, F_RID]))
            rid_o = arr[order, F_RID]
            newrun = np.append(True, rid_o[1:] != rid_o[:-1])
            run_start = np.maximum.accumulate(
                np.where(newrun, np.arange(len(order)), 0))
            rank = np.arange(len(order)) - run_start
            arr = arr[np.sort(order[rank < p.max_alignments_per_read])]

        al = fused_collect_np(
            arr, qlens_a.reshape(-1), id_base, None, p,
            self.planes.global_seq_names, self.planes.global_seq_lengths,
            self.meta)
        return al.data


def _pow2(x, lo=256):
    b = lo
    while b < x:
        b *= 2
    return b
