from .robustness import RobustnessEvaluator
from .perturbation import PerturbationTester

__all__ = ["RobustnessEvaluator", "PerturbationTester"]
