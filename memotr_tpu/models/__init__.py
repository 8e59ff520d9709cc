from .memotr import MeMOTR, build_model
