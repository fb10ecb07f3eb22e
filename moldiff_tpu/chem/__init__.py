from .mol import AROMATIC, Atom, Bond, Mol, MolError
from .sanitize import (
    MolReconsError,
    check_valence,
    fix_aromatic,
    fix_aromatic_reference,
    fix_valence,
    kekulize,
    reconstruct_from_generated,
    sanitize,
)
from .smiles import SmilesError, canonical_ranks, mol_from_smiles, mol_to_smiles
