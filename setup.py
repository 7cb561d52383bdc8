"""Package metadata (counterpart of reference setup.py:4-22)."""
from setuptools import find_packages, setup

setup(
    name="smokephysai-tpu",
    version="0.1.0",
    description=(
        "TPU-native (JAX/XLA/Pallas) physics-informed smoke simulation and "
        "chaos-feature learning framework"
    ),
    packages=find_packages(exclude=("tests",)),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "orbax-checkpoint",
        "numpy",
        "pyyaml",
        "matplotlib",
    ],
    extras_require={
        "benchmark": ["opencv-python", "scipy", "scikit-learn"],
        "logging": ["tensorboard"],
    },
)
