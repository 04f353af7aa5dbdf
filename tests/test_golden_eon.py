"""Golden end-to-end validation against Cantera-derived anchors.

The reference's temp-MLP scaler pkls store the global min/max over all 800
Eon temperature profiles (rows 1..800, i.e. excluding the inlet T) of the
Cantera-generated training set (temp_profile_model_training_2D.py:42-54):
    JetSurf: [865.285, 1118.909]
The max is the first post-inlet temperature of the hottest sampled case
(T0=1149.674 K, P0=1.656 bar) and the min is the outlet temperature of the
coldest case (T0=870.171 K, P0=1.418 bar) -- both directly reproducible by our
Eon PFR chain. The coldest-case outlet integrates chemistry over the full
800-segment reactor, making it a stringent whole-pipeline anchor.

Observed agreement (recorded 2026-08-16): coldest-case outlet matches Cantera
to ALL printed digits (865.285); hottest-case first-segment cooling agrees to
~3% of the 31 K drop (Cantera's advance_to_steady_state stops at its own loose
residual threshold in that extreme transient segment).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hexpyro.mechanism import to_device_arrays
from hexpyro.reactors.pfr import simulate_pfr

HOT_CASE = (1149.67427018, 1.65558468e5)
COLD_CASE = (870.1705391, 1.4183564e5)
JETSURF_SCALER = (865.2850877101556, 1118.908636939432)


class TestGoldenEonAnchors:
    def test_hot_case_first_segment(self, jetsurf, jetsurf_dev):
        """First-segment adiabatic cooling of the hottest 2D case vs Cantera."""
        # one segment of the 800-segment chain: length = 1.0/800
        traj = simulate_pfr(
            jetsurf_dev,
            jnp.array([HOT_CASE[0]]),
            jnp.array([HOT_CASE[1]]),
            species_names=jetsurf.species_names,
            length=1.0 / 800,
            n_steps=1,
            energy_on=True,
        )
        assert bool(traj.converged.all())
        dT_ours = HOT_CASE[0] - float(traj.T[0, 1])
        dT_ref = HOT_CASE[0] - JETSURF_SCALER[1]  # 30.77 K
        assert abs(dT_ours - dT_ref) / dT_ref < 0.05

    @pytest.mark.slow
    def test_cold_case_outlet_exact(self, jetsurf, jetsurf_dev):
        """Outlet T of the coldest case over the full 800-segment reactor.

        This is the scaler's global min; Cantera gives 865.2851 K. ~5 min CPU.
        """
        traj = simulate_pfr(
            jetsurf_dev,
            jnp.array([COLD_CASE[0]]),
            jnp.array([COLD_CASE[1]]),
            species_names=jetsurf.species_names,
            n_steps=800,
            energy_on=True,
        )
        assert bool(traj.converged.all())
        out = float(traj.T[0, -1])
        assert abs(out - JETSURF_SCALER[0]) < 0.01  # 10 mK of Cantera
