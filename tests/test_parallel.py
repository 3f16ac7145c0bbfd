"""Sharded-solver tests on the 8-device virtual CPU mesh.

The multi-chip path (shard_map + ppermute halo exchange + allreduced CFL
scalars) must reproduce the single-device solve bit-for-bit up to reduction
reordering."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from levelsetpy_tpu import (DubinsRel, SchemeConfig, create_grid, cylinder,
                            solve)
from levelsetpy_tpu.parallel import (halo_exchange_axis, make_mesh,
                                     pad_axis_sharded, solve_sharded)
from jax.sharding import PartitionSpec as P

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def air3d_setup(shape=(16, 16, 16)):
    grid = create_grid([-6, -10, 0], [20, 10, 2 * np.pi], shape,
                       periodic_dims=[2])
    target = cylinder(grid, ignore_axes=[2], radius=5.0, dtype=jnp.float64)
    system = DubinsRel(v_e=5.0, v_p=5.0, w_bound=1.0)
    return grid, system, target


class TestHalo:
    def test_halo_matches_unsharded_pad_periodic(self):
        """Sharded ghost-fill over a ring == global periodic pad."""
        from levelsetpy_tpu.boundary import pad_periodic

        mesh = make_mesh({"x": 8})
        data = jnp.arange(32.0).reshape(32, 1) * jnp.ones((1, 4))
        expect = pad_periodic(data, 0, 2)

        def body(local):
            return pad_axis_sharded(local, 0, 2, "x", periodic=True)

        out = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=P("x"), out_specs=P("x"),
            check_vma=False))(data)
        # sharded output: each shard padded; reconstruct the shard-0 block
        # and compare its ghosts with the global pad's relevant cells
        assert out.shape == (32 + 4 * 8, 4)  # 8 shards each grow by 2*width
        # shard 0 low ghosts must equal wrap-around from the global end
        np.testing.assert_allclose(out[:2], expect[:2])

    def test_halo_exchange_values(self):
        mesh = make_mesh({"x": 4})
        data = jnp.arange(16.0)

        def body(local):
            left, right = halo_exchange_axis(local, 0, 1, "x")
            return jnp.stack([left[0], right[0]])

        out = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=P("x"), out_specs=P("x"),
            check_vma=False))(data)
        # shard i holds [4i..4i+3]; left ghost = 4i-1 mod 16, right = 4i+4
        out = np.asarray(out).reshape(4, 2)
        np.testing.assert_allclose(out[:, 0], [15, 3, 7, 11])
        np.testing.assert_allclose(out[:, 1], [4, 8, 12, 0])


class TestShardedSolve:
    def test_matches_single_device_2d_mesh(self):
        grid, system, target = air3d_setup()
        cfg = SchemeConfig(accuracy="veryHigh", rk_order=2)
        tau = jnp.linspace(0.0, 0.2, 3)
        r1 = solve(grid, system, target, tau, cfg=cfg)
        mesh = make_mesh({"x": 2, "y": 4})
        r2 = solve_sharded(grid, system, target, tau,
                           shard_axes={0: "x", 1: "y"}, mesh=mesh, cfg=cfg)
        np.testing.assert_allclose(r1.values, r2.values, atol=1e-10)
        assert int(r1.steps) == int(r2.steps)

    def test_matches_single_device_periodic_axis_sharded(self):
        grid, system, target = air3d_setup()
        cfg = SchemeConfig(accuracy="eno3", rk_order=3)
        tau = jnp.linspace(0.0, 0.2, 3)
        r1 = solve(grid, system, target, tau, cfg=cfg)
        mesh = make_mesh({"a": 2, "th": 4})
        r2 = solve_sharded(grid, system, target, tau,
                           shard_axes={1: "a", 2: "th"}, mesh=mesh, cfg=cfg)
        np.testing.assert_allclose(r1.values, r2.values, atol=1e-10)

    def test_obstacles_sharded(self):
        grid, system, target = air3d_setup()
        from levelsetpy_tpu import sphere

        obstacle = sphere(grid, center=[10.0, 0.0, np.pi], radius=3.0,
                          dtype=jnp.float64)
        cfg = SchemeConfig(accuracy="eno2", rk_order=2)
        tau = jnp.linspace(0.0, 0.2, 3)
        r1 = solve(grid, system, target, tau, cfg=cfg, obstacles=obstacle)
        mesh = make_mesh({"x": 8})
        r2 = solve_sharded(grid, system, target, tau, shard_axes={0: "x"},
                           mesh=mesh, cfg=cfg, obstacles=obstacle)
        np.testing.assert_allclose(r1.values, r2.values, atol=1e-10)

    def test_rejects_non_divisible(self):
        grid, system, target = air3d_setup((15, 16, 16))
        mesh = make_mesh({"x": 2})
        with pytest.raises(ValueError, match="divide"):
            solve_sharded(grid, system, target, [0.0, 0.1],
                          shard_axes={0: "x"}, mesh=mesh)

    def test_rejects_halo_wider_than_shard(self):
        """WENO5 needs 3 ghost cells; 2 local nodes per shard must fail
        with a clear message, not a shape error mid-trace."""
        grid, system, target = air3d_setup((16, 16, 16))
        mesh = make_mesh({"th": 8})
        with pytest.raises(ValueError, match="stencil halo"):
            solve_sharded(grid, system, target, [0.0, 0.1],
                          shard_axes={2: "th"}, mesh=mesh)
