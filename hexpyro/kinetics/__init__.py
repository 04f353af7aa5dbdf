from .rates import ln_rate_constants
from .wdot import wdot, wdot_and_jacobian, rates_of_progress, ln_equilibrium_constants

__all__ = [
    "ln_rate_constants", "wdot", "wdot_and_jacobian",
    "rates_of_progress", "ln_equilibrium_constants",
]
