from .pipeline import MolSampler, classify_decoded
