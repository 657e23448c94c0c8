from .classifier import AttentionPool1d, Classifier, ClassifierStem
from .encoder_predictor import EncoderPredictor
from .layers import Conv1d, GroupNorm, ResBlock, TimeEmbedding
from .mfcc_encoder import ConvMFCCEncoder
from .registry import make_encoder, make_predictor
from .unet import UNetEncoder, UNetPredictor
from .wavegrad import WaveGradEncoder, WaveGradPredictor

__all__ = [
    "AttentionPool1d",
    "Classifier",
    "ClassifierStem",
    "EncoderPredictor",
    "Conv1d",
    "GroupNorm",
    "ResBlock",
    "TimeEmbedding",
    "ConvMFCCEncoder",
    "make_encoder",
    "make_predictor",
    "UNetEncoder",
    "UNetPredictor",
    "WaveGradEncoder",
    "WaveGradPredictor",
]
