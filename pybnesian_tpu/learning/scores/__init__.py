from .base import DynamicScoreAdaptator, Score, ValidatedScore
from .bic import BIC

__all__ = ["Score", "ValidatedScore", "DynamicScoreAdaptator", "BIC"]
