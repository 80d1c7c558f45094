"""Multi-chip sharding on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from tpufg.parallel.spatial import (HALO, halo_exchange_rows,
                                    make_sharded_interp_step,
                                    make_spatial_mesh)


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs


class TestHaloExchange:
    def test_neighbor_rows_and_edge_replication(self, devices):
        mesh = Mesh(np.array(devices[:4]), axis_names=("sp",))
        h_per = 8
        x = jnp.arange(4 * h_per, dtype=jnp.float32).reshape(1, 4 * h_per, 1)
        x = jnp.broadcast_to(x, (1, 4 * h_per, 8)).copy()

        f = shard_map(
            lambda s: halo_exchange_rows(s, "sp", 2),
            mesh=mesh, in_specs=P(None, "sp", None),
            out_specs=P(None, "sp", None), check_rep=False,
        )
        out = np.asarray(jax.jit(f)(x))  # [1, 4*(8+4), 8]
        blocks = out.reshape(1, 4, h_per + 4, 8)
        # interior shard 1: top halo = last rows of shard 0
        np.testing.assert_array_equal(blocks[0, 1, :2, 0], [6.0, 7.0])
        # bottom halo of shard 1 = first rows of shard 2
        np.testing.assert_array_equal(blocks[0, 1, -2:, 0], [16.0, 17.0])
        # shard 0 top halo: edge-replicated row 0
        np.testing.assert_array_equal(blocks[0, 0, :2, 0], [0.0, 0.0])
        # shard 3 bottom halo: edge-replicated last row
        np.testing.assert_array_equal(blocks[0, 3, -2:, 0], [31.0, 31.0])


class TestShardedStep:
    def test_matches_single_chip_interior(self, devices, rng):
        from tpufg.config import EngineConfig, resolve_sizes
        from tpufg.engine.pipeline import make_interp_step

        mesh = make_spatial_mesh(8, dp=2)
        in_h, in_w = 4 * HALO, 128     # 4 sp shards x 64 rows
        out_h, out_w = in_h * 2, in_w * 2
        step = make_sharded_interp_step(mesh, in_h, in_w, out_h, out_w)

        frames = rng.integers(0, 256, (2, 2, in_h, in_w, 4), dtype=np.uint8)
        out_i, out_c = step(jnp.asarray(frames[0]), jnp.asarray(frames[1]))
        assert out_i.shape == (2, out_h, out_w, 4)

        cfg = resolve_sizes(EngineConfig(
            input_width=in_w, input_height=in_h,
            output_width=out_w, output_height=out_h,
            dtype="f32", motion_mode="pyramid"))
        ref_step = make_interp_step(cfg)
        ref_c = np.asarray(ref_step(jnp.asarray(frames[0][0]),
                                    jnp.asarray(frames[1][0]))[1])
        got_c = np.asarray(out_c[0])
        # the scaled-current path has no cross-shard data dependence beyond
        # the Lanczos taps, fully covered by the halo: interior rows of each
        # shard must match the single-chip result exactly (uint8)
        interior = slice(8, -8)
        diff = np.abs(got_c[interior].astype(int) - ref_c[interior].astype(int))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 1e-3


class TestMeshFactory:
    def test_bad_dp_rejected(self, devices):
        with pytest.raises(ValueError):
            make_spatial_mesh(8, dp=3)
