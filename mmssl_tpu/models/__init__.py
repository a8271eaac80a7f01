"""Model zoo registry.

Models: mmssl (flagship, adversarial+contrastive), lattice, micro, and the CF
baselines lightgcn / ngcf / mf (reference: MMSSL/Models.py, LATTICE/codes/
Models.py, MICRO/codes/Models.py).
"""

from mmssl_tpu.models.cf import (  # noqa: F401
    CFOutput,
    apply_lightgcn,
    apply_mf,
    apply_ngcf,
    cf_branch,
    init_lightgcn,
    init_mf,
    init_ngcf,
)
from mmssl_tpu.models.lattice import LatticeOutput, apply_lattice, init_lattice  # noqa: F401
from mmssl_tpu.models.micro import MicroOutput, apply_micro, init_micro  # noqa: F401
from mmssl_tpu.models.mmssl import (  # noqa: F401
    BipartiteGraphs,
    MMSSLOutput,
    apply_discriminator,
    apply_mmssl,
    init_discriminator,
    init_mmssl,
)

MODEL_NAMES = ("mmssl", "lattice", "micro", "lightgcn", "ngcf", "mf")
