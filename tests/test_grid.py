"""Sorted uniform-grid structure: determinism, capacity semantics, table
contents (reference behavior: Bucket.compute:18-53)."""

import jax.numpy as jnp
import numpy as np

from sphfluidsimulation_tpu.ops.grid import (
    build_bucket,
    flat_cell_id,
    overflow_count,
)


def test_flat_cell_id():
    # x + y*R + z*R^2 (Bucket.compute:28)
    cell = jnp.array([[1, 2, 3]], jnp.int32)
    assert int(flat_cell_id(cell, 47)[0]) == 1 + 2 * 47 + 3 * 47 * 47


def test_table_contents_small():
    r, cap = 4, 2
    # cells at R-1 scaling: pos * 3
    pos = jnp.array([
        [0.0, 0.0, 0.0],   # cell (0,0,0) id 0
        [0.1, 0.0, 0.0],   # cell (0,0,0) id 0
        [0.9, 0.0, 0.0],   # cell (2,0,0) id 2
        [0.05, 0.0, 0.0],  # cell (0,0,0) id 0 -> overflows cap 2
    ], jnp.float32)
    bucket, _ = build_bucket(pos, r, cap)
    table = np.asarray(bucket.table)
    n = 4
    # cell 0 slots: particles 0 and 1 (deterministic index order), 3 dropped
    assert list(table[0:2]) == [0, 1]
    assert list(table[2 * cap:2 * cap + 2]) == [2, n]
    assert int(overflow_count(bucket)) == 1
    assert list(np.asarray(bucket.in_table)) == [True, True, True, False]
    assert list(np.asarray(bucket.rank)) == [0, 1, 0, 2]


def test_deterministic_rebuild():
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0, 1, (512, 3)), jnp.float32)
    a, _ = build_bucket(pos, 9, 8)
    b, _ = build_bucket(pos, 9, 8)
    np.testing.assert_array_equal(np.asarray(a.table), np.asarray(b.table))


def test_out_of_range_positions_dropped_or_aliased():
    r, cap = 4, 4
    pos = jnp.array([
        [1.2, 0.0, 0.0],    # cell x=3 (1.2*3=3.6 trunc 3) -> in range
        [2.0, 0.0, 0.0],    # cell x=6 -> flat 6 < 64, aliases to (2,1,0)
        [30.0, 30.0, 30.0], # flat way out of range -> dropped
    ], jnp.float32)
    bucket, _ = build_bucket(pos, r, cap)
    in_table = np.asarray(bucket.in_table)
    assert bool(in_table[0]) is True
    assert bool(in_table[1]) is True   # aliased but inserted, like the
                                       # reference's unchecked flat index
    assert bool(in_table[2]) is False
    table = np.asarray(bucket.table)
    assert table[6 * cap] == 1         # aliased slot


def test_capacity_none_keeps_everything():
    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.uniform(0, 1, (256, 3)), jnp.float32)
    bucket, cap = build_bucket(pos, 3, None)
    assert cap == 0
    assert bool(np.all(np.asarray(bucket.in_table)))


def test_sorted_order_is_cell_contiguous():
    rng = np.random.default_rng(2)
    pos = jnp.asarray(rng.uniform(0, 1, (1024, 3)), jnp.float32)
    bucket, _ = build_bucket(pos, 9, 32)
    cid_sorted = np.asarray(bucket.cell_id)[np.asarray(bucket.order)]
    assert bool(np.all(np.diff(cid_sorted) >= 0))
