from .bond_predictor import BondPredictor
from .moldiff import MolDiff, MolDiffPreds, SampleResult
