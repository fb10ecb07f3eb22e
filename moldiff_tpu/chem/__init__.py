from .mol import AROMATIC, Atom, Bond, Mol, MolError
from .sanitize import (
    MolReconsError,
    check_valence,
    fix_aromatic,
    fix_valence,
    kekulize,
    reconstruct_from_generated,
    sanitize,
)
from .smiles import canonical_ranks, mol_to_smiles
