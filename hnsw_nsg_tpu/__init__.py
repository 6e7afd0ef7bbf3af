"""hnsw_nsg_tpu — TPU-native graph ANN index & query framework.

A from-scratch JAX/XLA/Pallas re-design of Cookiecoolkid/hnsw-nsg's three
engines (hnswlib HNSW, efanna nn-descent -> NSG, CNNS cluster pipeline, and
the hybrid HNSW-upper/NSG-base index). Blueprint: SURVEY.md at repo root.
"""

__version__ = "0.1.0"

from .ops.distance import PAD_DIST, PAD_ID  # noqa: F401
