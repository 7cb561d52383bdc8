from .synthetic import (
    SyntheticSmokeDataset,
    create_data_loaders,
    generate_dataset,
    sample_source_params,
)

__all__ = [
    "SyntheticSmokeDataset",
    "create_data_loaders",
    "generate_dataset",
    "sample_source_params",
]
