from .mfcc import MFCCConfig, mfcc

__all__ = ["MFCCConfig", "mfcc"]
