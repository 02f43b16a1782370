"""dist/: sharded alignment step and scaling harness on the virtual mesh."""

import numpy as np
import pytest

from megapath_nano_tpu.dist.scaling import measure_scaling


def test_sharded_dryrun_entrypoint():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(4)
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_scaling_harness_runs():
    points = measure_scaling([1, 2], genome_per_shard=20000, n_reads=32,
                             iters=1)
    assert len(points) == 2
    assert points[0].n_shards == 1 and points[1].n_shards == 2
    assert all(p.reads_per_s > 0 for p in points)
    # work per shard halves at 2 shards (index split), so the structure is
    # sound if the step still completes and merges (efficiency itself is
    # only meaningful on real chips)
    assert 0 < points[1].efficiency
