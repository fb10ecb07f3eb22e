from .batching import (
    DEFAULT_BUCKETS,
    MolBatch,
    node_mask_from_counts,
    pad_mols,
    pick_bucket,
    sample_size_placeholder,
    unpad_arrays,
)
from .featurize import (
    GEOM_DRUG_ATOMIC_NUMBERS,
    GEOM_DRUG_BOND_TYPES,
    GEOM_DRUG_SIZE_MEAN,
    GEOM_DRUG_SIZE_STD,
    MolFeaturizer,
)
