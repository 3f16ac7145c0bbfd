"""Time-to-reach recording and checkpoint/resume tests."""
import jax.numpy as jnp
import numpy as np

from levelsetpy_tpu import (DoubleIntegrator, SchemeConfig, create_grid,
                            load_checkpoint, resume_tau, save_checkpoint,
                            solve, sphere)


class TestTTR:
    def test_ttr_matches_analytic_ordering(self):
        """TTR recorded during a double-integrator BRT solve must increase
        with the analytic minimum time-to-reach, and be ~0 inside the
        initial target."""
        g = create_grid([-1.0, -1.0], [1.0, 1.0], 81)
        sys_ = DoubleIntegrator(u_max=1.0)
        xs = g.mesh(jnp.float64)
        mttr = sys_.mttr(xs[0], xs[1])
        a = 0.5
        phi0 = mttr - a
        res = solve(g, sys_, phi0, tau=jnp.linspace(0.0, 0.6, 7),
                    cfg=SchemeConfig(accuracy="eno2", rk_order=2),
                    record_ttr=True)
        ttr = np.asarray(res.ttr)
        m = np.asarray(mttr)
        assert ttr.shape == g.shape
        # initial target: ttr == 0
        assert (ttr[np.asarray(phi0) <= 0] == 0).all()
        # reached nodes: recorded time approximates analytic (mttr - a),
        # away from the boundary rim and the switching-curve kink
        interior = np.zeros_like(m, dtype=bool)
        interior[8:-8, 8:-8] = True
        kink = np.abs(np.asarray(xs[0])
                      + 0.5 * np.asarray(xs[1]) * np.abs(np.asarray(xs[1])))
        ok = np.isfinite(ttr) & (ttr > 0) & interior & (kink > 0.1)
        assert ok.sum() > 300
        err = np.abs(ttr[ok] - (m[ok] - a))
        assert np.median(err) < 0.05, np.median(err)
        assert np.percentile(err, 90) < 0.15
        # never-reached nodes stay inf
        assert np.isinf(ttr[m > 1.5]).all()

    def test_ttr_none_by_default(self):
        g = create_grid([-1.0, -1.0], [1.0, 1.0], 21)
        sys_ = DoubleIntegrator()
        phi0 = sphere(g, radius=0.2, dtype=jnp.float64)
        res = solve(g, sys_, phi0, tau=jnp.array([0.0, 0.1]),
                    cfg=SchemeConfig(accuracy="first", rk_order=1))
        assert res.ttr is None


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        tree = {"v": jnp.arange(12.0).reshape(3, 4), "t": jnp.float64(2.5)}
        save_checkpoint(tmp_path / "ckpt", tree, metadata={"note": "x"})
        back = load_checkpoint(tmp_path / "ckpt", like=tree)
        np.testing.assert_allclose(back["v"], tree["v"])
        np.testing.assert_allclose(back["t"], 2.5)

    def test_resume_continues_solve(self, tmp_path):
        """Solve 0->0.2, checkpoint, resume 0.2->0.4: final value matches a
        direct 0->0.4 solve."""
        g = create_grid([-1.0, -1.0], [1.0, 1.0], 41)
        sys_ = DoubleIntegrator(u_max=1.0)
        phi0 = sphere(g, radius=0.2, dtype=jnp.float64)
        cfg = SchemeConfig(accuracy="eno2", rk_order=2)
        full = solve(g, sys_, phi0, tau=jnp.linspace(0.0, 0.4, 5), cfg=cfg)

        part1 = solve(g, sys_, phi0, tau=jnp.linspace(0.0, 0.2, 3), cfg=cfg)
        save_checkpoint(tmp_path / "part1",
                        {"v": part1.values[-1], "tau": part1.tau})
        state = load_checkpoint(
            tmp_path / "part1",
            like={"v": part1.values[-1], "tau": part1.tau})
        tau2 = resume_tau(state["tau"], jnp.array([0.3, 0.4]))
        part2 = solve(g, sys_, jnp.asarray(state["v"]), tau2, cfg=cfg)
        np.testing.assert_allclose(part2.values[-1], full.values[-1],
                                   atol=1e-10)

    def test_roundtrip_without_like(self, tmp_path):
        """npz checkpoints must restore the exact pytree structure with NO
        template (the treedef is pickled into the archive)."""
        tree = {"v": jnp.arange(12.0).reshape(3, 4),
                "cfg": (jnp.float64(0.8), jnp.int32(3))}
        save_checkpoint(tmp_path / "ckpt", tree, metadata={"k": 1},
                        format="npz")
        back = load_checkpoint(tmp_path / "ckpt")
        assert isinstance(back, dict) and set(back) == {"v", "cfg"}
        np.testing.assert_allclose(back["v"], tree["v"])
        np.testing.assert_allclose(back["cfg"][0], 0.8)
        from levelsetpy_tpu.checkpoint import load_metadata
        assert load_metadata(tmp_path / "ckpt") == {"k": 1}

    def test_unknown_format_rejected(self, tmp_path):
        import pytest
        with pytest.raises(ValueError, match="format"):
            save_checkpoint(tmp_path / "c", {"v": jnp.zeros(2)},
                            format="hdf5")
