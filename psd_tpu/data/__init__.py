from .limuc import AugmentConfig, DataLoader, LIMUCDataset, PILAugment

__all__ = ["AugmentConfig", "DataLoader", "LIMUCDataset", "PILAugment"]
