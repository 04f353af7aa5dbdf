"""Stage-1 seed-fit tests: batch-reactor probe + Arrhenius fit golden anchors."""

import numpy as np
import pytest

from hexpyro.mechanism import to_device_arrays
from hexpyro.pipeline.seedfit import (
    consumption_rate_sweep,
    fit_seed_arrhenius,
    read_consumption_csv,
    write_consumption_csv,
)

REF_CSV = "/root/reference/INITIAL_ARRHENIUS_PARAMETER_OPTIMIZATION/INITIAL_FEED_CONSUMPTION_RATE"


class TestSeedFit:
    @pytest.mark.parametrize(
        "name,ea_expected",
        [("LLNL", 67.933), ("JetSurf", 61.713), ("NUIG", 58.397)],
    )
    def test_fit_reproduces_reference_constants(self, name, ea_expected):
        """Fitting the checked-in 1-bar probe CSVs must reproduce the Ea values
        hand-copied into the CRNN training scripts
        (Eoff_surrogate_model_training.py:29-38)."""
        T, C0, rate = read_consumption_csv(f"{REF_CSV}/{name}_cons_rate_1b_v2.csv")
        assert len(T) == 151
        b, ea = fit_seed_arrhenius(T, C0, rate)
        assert abs(ea - ea_expected) < 0.05
        assert 1.5 < b < 3.0

    def test_csv_roundtrip(self, tmp_path):
        T = np.array([900.0, 1000.0])
        C0 = np.array([0.01, 0.012])
        rate = np.array([1e-4, 1e-2])
        p = str(tmp_path / "probe.csv")
        write_consumption_csv(p, T, C0, rate)
        T2, C2, r2 = read_consumption_csv(p)
        np.testing.assert_allclose(T2, T)
        np.testing.assert_allclose(r2, rate)

    def test_probe_sweep_jetsurf(self, jetsurf):
        """A coarse batched probe on JetSurf: rates positive, strongly increasing
        in T, C0 matching the ideal-gas value."""
        arr = to_device_arrays(jetsurf)
        T, C0, rate, done = consumption_rate_sweep(
            arr, jetsurf.species_names, T_start=950.0, T_end=1150.0, T_step=50.0
        )
        assert done.all()
        # pure hexane at 1 bar: C0 = P/(R T) in kmol/m^3 (=mol/L)
        np.testing.assert_allclose(C0, 1e5 / (8314.462618 * T), rtol=1e-10)
        assert np.all(rate > 0)
        assert np.all(np.diff(rate) > 0)
        # Arrhenius-like growth: >100x from 950->1150 K
        assert rate[-1] / rate[0] > 100.0
        b, ea = fit_seed_arrhenius(T, C0, rate)
        # in the ballpark of the reference JetSurf fit (2.11, 61.7)
        assert 40.0 < ea < 85.0
