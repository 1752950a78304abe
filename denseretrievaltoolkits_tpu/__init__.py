"""denseretrievaltoolkits_tpu: TPU-native dense retrieval framework (JAX/XLA/Pallas/pjit)."""

__version__ = "0.1.0"
