"""Frame-sequence export (the reference's live-viz capability, post-hoc)."""
import json

import jax.numpy as jnp
import numpy as np

from levelsetpy_tpu import (DoubleIntegrator, DubinsRel, SchemeConfig,
                            create_grid, cylinder, solve, sphere)
from levelsetpy_tpu.viz import export_frames


class TestExportFrames:
    def test_2d_contour_frames(self, tmp_path):
        g = create_grid([-1.0, -1.0], [1.0, 1.0], 41)
        sys_ = DoubleIntegrator(u_max=1.0)
        phi0 = sphere(g, radius=0.2, dtype=jnp.float64)
        res = solve(g, sys_, phi0, tau=jnp.linspace(0.0, 0.3, 4),
                    cfg=SchemeConfig(accuracy="eno2", rk_order=2))
        paths = export_frames(g, res, tmp_path / "seq")
        assert len(paths) == 4
        manifest = json.loads((tmp_path / "seq" / "manifest.json")
                              .read_text())
        vols = [f["volume"] for f in manifest["frames"]]
        assert vols == sorted(vols)  # BRT grows
        rec = np.load(paths[-1])
        assert str(rec["kind"]) == "contour"
        segs = rec["segments"]
        assert segs.ndim == 3 and segs.shape[1:] == (2, 2)
        # all segment endpoints inside the domain
        assert (np.abs(segs) <= 1.0 + 1e-6).all()

    def test_3d_mesh_frames_and_render(self, tmp_path):
        g = create_grid([-6, -10, 0], [20, 10, 2 * np.pi], 15,
                        periodic_dims=[2])
        target = cylinder(g, ignore_axes=[2], radius=5.0,
                          dtype=jnp.float64)
        sys_ = DubinsRel(v_e=5.0, v_p=5.0, w_bound=1.0)
        res = solve(g, sys_, target, tau=jnp.linspace(0.0, 0.2, 3),
                    cfg=SchemeConfig(accuracy="eno2", rk_order=2))
        paths = export_frames(g, res, tmp_path / "seq", render=True)
        rec = np.load(paths[0])
        assert str(rec["kind"]) == "mesh"
        assert rec["verts"].shape[1] == 3 and rec["faces"].shape[1] == 3
        assert len(rec["faces"]) > 0
        assert (tmp_path / "seq" / "frame_0000.png").exists()
        manifest = json.loads((tmp_path / "seq" / "manifest.json")
                              .read_text())
        assert manifest["frames"][0]["png"] == "frame_0000.png"

    def test_4d_requires_and_uses_projection(self, tmp_path):
        import pytest

        from levelsetpy_tpu import PlanarDoubleIntegrator

        g = create_grid([-1, -1, -1, -1], [1, 1, 1, 1], 11)
        sys_ = PlanarDoubleIntegrator(u_max=1.0)
        phi0 = sphere(g, radius=0.3, dtype=jnp.float64)
        res = solve(g, sys_, phi0, tau=jnp.array([0.0, 0.1]),
                    cfg=SchemeConfig(accuracy="first", rk_order=1))
        with pytest.raises(ValueError, match="proj_axes"):
            export_frames(g, res, tmp_path / "a")
        paths = export_frames(g, res, tmp_path / "b", proj_axes=[0, 1])
        rec = np.load(paths[0])
        assert str(rec["kind"]) == "contour"


class TestAnimate:
    def test_2d_gif(self, tmp_path):
        from levelsetpy_tpu.viz import animate

        g = create_grid([-1.0, -1.0], [1.0, 1.0], 31)
        sys_ = DoubleIntegrator(u_max=1.0)
        phi0 = sphere(g, radius=0.2, dtype=jnp.float64)
        res = solve(g, sys_, phi0, tau=jnp.linspace(0.0, 0.3, 3),
                    cfg=SchemeConfig(accuracy="eno2", rk_order=2))
        out = animate(g, res, tmp_path / "tube.gif", fps=2)
        data = out.read_bytes()
        assert data[:6] in (b"GIF87a", b"GIF89a")
        assert len(data) > 1000

    def test_3d_projected_gif(self, tmp_path):
        from levelsetpy_tpu.viz import animate

        g = create_grid([-6, -10, 0], [20, 10, 2 * np.pi], 15,
                        periodic_dims=[2])
        sys_ = DubinsRel(v_e=5.0, v_p=5.0, w_bound=1.0)
        target = cylinder(g, ignore_axes=[2], radius=5.0,
                          dtype=jnp.float64)
        res = solve(g, sys_, target, tau=jnp.linspace(0.0, 0.2, 2),
                    cfg=SchemeConfig(accuracy="eno2", rk_order=2))
        out = animate(g, res, tmp_path / "proj.gif", proj_axes=(0, 1))
        assert out.read_bytes()[:6] in (b"GIF87a", b"GIF89a")


class TestInspectionPlots:
    """visGrid / visFuncIm parity (ref Visualization/visualizer.py:71,177)."""

    def test_plot_grid_dims(self):
        from levelsetpy_tpu.decompose import split_grid_same_dim
        from levelsetpy_tpu.viz import plot_grid

        g1 = create_grid([0.0], [1.0], 11)
        ax = plot_grid(g1)
        assert ax.get_title().startswith("1-cell / 1-D")

        g2 = create_grid([-1.0, -1.0], [1.0, 1.0], 9)
        cells = split_grid_same_dim(g2, [[-1.0, 0.0, 1.0],
                                         [-1.0, 0.0, 1.0]])
        ax = plot_grid(cells, annotate=True)
        assert "4-cell / 2-D" in ax.get_title()

        g3 = create_grid([0, 0, 0], [1, 1, 1], 7)
        ax = plot_grid(g3)
        assert ax.name == "3d"

        g4 = create_grid([0, 0, 0, 0], [1, 1, 1, 1], 5)
        ax = plot_grid(g4)  # >3-D projects onto the first two axes
        assert "4-D" in ax.get_title()

    def test_plot_function_image(self):
        import pytest

        from levelsetpy_tpu.viz import plot_function_image

        g1 = create_grid([0.0], [1.0], 21)
        v1 = np.linspace(0, 1, 21) ** 2
        ax = plot_function_image(g1, v1)
        assert len(ax.lines) == 1

        g2 = create_grid([-1.0, -1.0], [1.0, 1.0], 17)
        phi = np.asarray(sphere(g2, radius=0.5, dtype=jnp.float64))
        ax = plot_function_image(g2, phi)
        assert ax.name == "3d"

        g3 = create_grid([0, 0, 0], [1, 1, 1], 5)
        with pytest.raises(ValueError, match="1-D and 2-D"):
            plot_function_image(g3, np.zeros((5, 5, 5)))
