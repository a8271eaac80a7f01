"""mmssl_tpu: a TPU-native multi-modal self-supervised recommendation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of HKUDS/MMSSL
(the MMSSL / LATTICE / MICRO family of multi-modal recommenders), built for
TPU hardware: jit-compiled train/eval steps, device-resident sparse graph
propagation, mesh-sharded embedding tables and catalog-sharded full-catalog
scoring, and a real test/checkpoint/observability layer (the reference has
none).

Reference behavior contract: /root/reference (see SURVEY.md for the layer map
and the quirk ledger). This package is a new design, not a port.
"""

__version__ = "0.1.0"

from mmssl_tpu.config import (  # noqa: F401
    DataConfig,
    EvalConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
    preset,
)
