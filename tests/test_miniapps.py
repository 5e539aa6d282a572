"""Miniapp smoke tests (reference: miniapps run in CI with small sizes).

Each driver runs end-to-end with tiny sizes, `--check last`, on the local
backend and a 2x2 grid, under the CPU mesh.
"""

import numpy as np
import pytest

from dlaf_tpu.miniapp import (band_to_tridiag, bt_band_to_tridiag,
                              bt_reduction_to_band, cholesky, eigensolver,
                              gen_eigensolver, gen_to_std,
                              inverse_from_cholesky_factor, redistribution,
                              reduction_to_band, triangular_inverse,
                              triangular_multiplication, triangular_solver,
                              tridiag_solver)

COMMON = ["-n", "48", "-b", "8", "--nruns", "1", "--nwarmups", "0",
          "--check", "last", "--csv"]
GRID = ["--grid-rows", "2", "--grid-cols", "2"]


@pytest.mark.parametrize("mod", [
    cholesky, gen_to_std, triangular_solver, triangular_multiplication,
    triangular_inverse, inverse_from_cholesky_factor, reduction_to_band,
    tridiag_solver, band_to_tridiag,
])
def test_miniapp_local(mod, capsys):
    assert mod.main(COMMON) == 0
    out = capsys.readouterr().out
    assert "GFlop/s" in out
    assert "CSVData-2" in out
    if "residual" in out:
        assert "PASSED" in out


@pytest.mark.parametrize("mod", [cholesky, triangular_solver,
                                 reduction_to_band])
def test_miniapp_distributed(mod, capsys):
    assert mod.main(COMMON + GRID) == 0
    assert "PASSED" in capsys.readouterr().out


def test_miniapp_eigensolver(capsys):
    assert eigensolver.main(COMMON) == 0
    assert "PASSED" in capsys.readouterr().out


def test_miniapp_gen_eigensolver(capsys):
    assert gen_eigensolver.main(COMMON) == 0
    assert "PASSED" in capsys.readouterr().out


def test_miniapp_bt_stages(capsys):
    assert bt_band_to_tridiag.main(COMMON) == 0
    assert bt_reduction_to_band.main(COMMON) == 0


def test_miniapp_redistribution(capsys):
    assert redistribution.main(COMMON + GRID) == 0
    assert "GB/s" in capsys.readouterr().out


def test_check_fails_on_perturbed_result(capsys, monkeypatch):
    """A deliberately wrong result must FAIL the type-scaled check (the
    reference's check_cholesky-style norm-ratio bound, not a fixed 1e-1
    threshold): perturb the Cholesky factor and expect rc=1 + FAILED."""
    import dlaf_tpu
    from dlaf_tpu.miniapp import cholesky as mc

    real = dlaf_tpu.cholesky_factorization

    def perturbed(a, *args, **kw):
        out = real(a, *args, **kw)
        data = out.data.at[0, 0].add(np.asarray(1e-2, out.dtype))
        return out.with_data(data)

    # the miniapp resolves the symbol from the package at call time
    monkeypatch.setattr(dlaf_tpu, "cholesky_factorization", perturbed)
    assert mc.main(COMMON) == 1
    out = capsys.readouterr().out
    assert "FAILED" in out


def test_check_tolerance_type_scaled():
    from dlaf_tpu.miniapp.runner import check_tolerance
    t32 = check_tolerance(np.float32, 1024)
    t64 = check_tolerance(np.float64, 1024)
    assert t64 < t32 < 1e-3          # far stricter than the old 1e-1
    assert check_tolerance(np.complex64, 1024) == t32


def test_tune_flag_plumbing(capsys):
    """--dlaf:key=value reaches TuneParameters (reference --dlaf: flags)."""
    from dlaf_tpu.tune import get_tune_parameters
    old = get_tune_parameters().eigensolver_min_band
    assert cholesky.main(COMMON + ["--dlaf:eigensolver_min_band=7"]) == 0
    assert get_tune_parameters().eigensolver_min_band == 7
    from dlaf_tpu.tune import set_tune_parameters
    set_tune_parameters(eigensolver_min_band=old)
