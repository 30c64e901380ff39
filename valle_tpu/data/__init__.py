from .collation import TextTokenCollater, get_text_token_collater  # noqa: F401
from .datamodule import DataLoader, TtsDataModule  # noqa: F401
from .dataset import SpeechSynthesisDataset  # noqa: F401
from .fbank import BigVGANFbank, BigVGANFbankConfig, get_fbank_extractor  # noqa: F401
from .input_strategies import (  # noqa: F401
    PrecomputedFeatures,
    PromptedFeatures,
    PromptedPrecomputedFeatures,
)
from .manifests import Cut, CutSet, FeatureRef, Hdf5FeatureStore, RecordingRef  # noqa: F401
from .sampler import DynamicBucketingSampler, SimpleCutSampler  # noqa: F401
from .tokenizer import (  # noqa: F401
    AudioTokenConfig,
    AudioTokenExtractor,
    AudioTokenizer,
    TextTokenizer,
    tokenize_audio,
    tokenize_text,
)
