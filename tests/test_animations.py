"""Animated paper figures (the reference's viz/ gif scripts re-built on the
framework's own solvers; reference: viz/*.py)."""

from pathlib import Path

from ppi_tpu.runners import animations as A


class TestAnimations:
    def test_all_four_render(self, tmp_path):
        out = Path(tmp_path)
        p1 = A.anim_gaussian_ppi(out, n_frames=3)
        p2 = A.anim_nonlinear_ppi(out, n_frames_per=1)
        p3 = A.anim_policy_time_shift(out, n_frames=3)
        p4 = A.anim_policy_time_resolution(out, n_frames=2)
        for p in (p1, p2, p3, p4):
            assert p.exists() and p.stat().st_size > 1000, p
        assert {p.name for p in (p1, p2, p3, p4)} == {
            "gaussian_ppi.gif", "nonlinear_ppi.gif",
            "policy_time_shift.gif", "policy_time_resolution.gif"}
