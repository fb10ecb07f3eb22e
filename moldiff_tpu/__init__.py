"""moldiff_tpu: TPU-native 3D molecule diffusion framework.

A from-scratch JAX/XLA re-design of MolDiff (pengxingang/MolDiff, ICML 2023):
joint diffusion over atom positions (Gaussian), atom types and bond types
(categorical with learned-prior transition matrices and a decoupled bond
noise schedule), plus a bond-predictor guidance model — engineered for TPU:
dense padded complete-graph layout, lax.scan samplers, pjit data parallelism,
fused Pallas kernels, and a first-party chemistry/runtime stack (sanitizer,
SMILES, SDF, C++ record store).
"""

__version__ = "0.2.0"

from . import chem, data, eval, models, ops, parallel, sample, train, utils  # noqa: E402,F401
