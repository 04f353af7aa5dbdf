"""hexpyro: a TPU-native (JAX/XLA/Pallas) n-hexane pyrolysis surrogate-reactor framework.

A from-scratch rebuild of the capabilities of
CHOIHSpotato/n-hexane-pyrolysis-surrogate-reactor-model: stiff plug-flow-reactor
ground-truth generation directly from Cantera-format YAML mechanisms, CRNN /
temperature-MLP / time-MLP surrogate training, deployment and the full metric suite.
"""

__version__ = "0.1.0"


def enable_x64() -> None:
    """Enable 64-bit jax globally (required for the stiff ground-truth solver)."""
    import jax

    jax.config.update("jax_enable_x64", True)
