"""Text frontends (phonemization) and the audio tokenizer (EnCodec-on-TPU).

Capability parity with reference ``valle/data/tokenizer.py``:
- ``TextTokenizer`` (:116) with espeak (en-us, via phonemizer/espeak-ng) and
  pypinyin backends (``pypinyin`` syllable mode and
  ``pypinyin_initials_finals``, :40-113), identical separators
  (word="_", syllable="-", phone="|") and ``to_list`` symbol splitting
  (:152-164);
- ``AudioTokenizer`` (:211) encode/decode at 24 kHz / 8 quantizers /
  75 Hz — here backed by the JAX EnCodec port running on TPU;
- ``tokenize_text`` (:176) and ``tokenize_audio`` (:245) helpers;
- ``AudioTokenConfig``/``AudioTokenExtractor`` equivalents for the offline
  feature-extraction pipeline (:257-361).

Environment gating: espeak needs the ``phonemizer`` package (C espeak-ng
backend) and pypinyin needs ``pypinyin``; neither ships in this image, so a
self-contained ``char`` backend (grapheme tokenization) is provided as the
always-available fallback and the others raise a clear error when their
host libraries are missing.
"""

from __future__ import annotations

import re
from dataclasses import asdict, dataclass, field
from typing import Any, Dict, List, Optional, Pattern, Union

import numpy as np

# phonemizer's Punctuation.default_marks()
DEFAULT_PUNCTUATION_MARKS = ';:,.!?¡¿—…"«»“”'


@dataclass(frozen=True)
class Separator:
    word: str = "_"
    syllable: str = "-"
    phone: str = "|"


class CharBackend:
    """Grapheme backend: words separated, characters as symbols.

    Self-contained fallback (no native deps); useful for debugging recipes
    the way LJSpeech is used in the reference (egs/ljspeech/README.md:22).
    """

    def __init__(self, punctuation_marks: str = DEFAULT_PUNCTUATION_MARKS):
        self.punctuation_marks = punctuation_marks

    def phonemize(self, text: List[str], separator: Separator,
                  strip: bool = True, njobs: int = 1) -> List[str]:
        out = []
        for _text in text:
            _text = re.sub(" +", " ", _text.strip()).lower()
            words = _text.split(" ")
            pieces = []
            for w in words:
                pieces.append(separator.phone.join(list(w)))
            out.append(separator.word.join(pieces))
        return out


class PypinyinBackend:
    """Chinese pinyin backend (two modes), parity with reference :40-113."""

    def __init__(self, backend="initials_finals",
                 punctuation_marks: str = DEFAULT_PUNCTUATION_MARKS) -> None:
        try:
            from pypinyin import Style, pinyin  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "PypinyinBackend requires the 'pypinyin' package") from e
        self.backend = backend
        self.punctuation_marks = punctuation_marks

    def phonemize(self, text: List[str], separator: Separator,
                  strip: bool = True, njobs: int = 1) -> List[str]:
        from pypinyin import Style, pinyin
        from pypinyin.style._utils import get_finals, get_initials

        assert isinstance(text, list)
        phonemized = []
        for _text in text:
            _text = re.sub(" +", " ", _text.strip())
            _text = _text.replace(" ", separator.word)
            phones = []
            for py in pinyin(_text, style=Style.TONE3,
                             neutral_tone_with_five=True):
                if all(c in self.punctuation_marks for c in py[0]):
                    if len(phones):
                        assert phones[-1] == separator.syllable
                        phones.pop(-1)
                    phones.extend(list(py[0]))
                elif self.backend == "pypinyin":
                    phones.extend([py[0], separator.syllable])
                else:  # pypinyin_initials_finals
                    if py[0][-1].isalnum():
                        initial = get_initials(py[0], strict=False)
                        if py[0][-1].isdigit():
                            final = get_finals(py[0][:-1],
                                               strict=False) + py[0][-1]
                        else:
                            final = get_finals(py[0], strict=False)
                        phones.extend([initial, separator.phone, final,
                                       separator.syllable])
                    else:
                        raise ValueError(py[0])
            phonemized.append("".join(phones).rstrip(
                f"{separator.word}{separator.syllable}"))
        return phonemized


def _make_espeak_backend(language: str, punctuation_marks, preserve_punct,
                         with_stress, tie, language_switch, words_mismatch):
    try:
        from phonemizer.backend import EspeakBackend
        from phonemizer.punctuation import Punctuation
    except ImportError as e:
        raise ImportError(
            "espeak backend requires the 'phonemizer' package (espeak-ng)"
        ) from e
    return EspeakBackend(
        language,
        punctuation_marks=punctuation_marks,
        preserve_punctuation=preserve_punct,
        with_stress=with_stress,
        tie=tie,
        language_switch=language_switch,
        words_mismatch=words_mismatch,
    )


class TextTokenizer:
    """Phonemize text into symbol lists (reference tokenizer.py:116-173)."""

    def __init__(
        self,
        language: str = "en-us",
        backend: str = "espeak",
        separator: Separator = Separator(),
        preserve_punctuation: bool = True,
        punctuation_marks: Union[str, Pattern] = DEFAULT_PUNCTUATION_MARKS,
        with_stress: bool = False,
        tie: Union[bool, str] = False,
        language_switch: str = "keep-flags",
        words_mismatch: str = "ignore",
    ) -> None:
        if backend == "espeak":
            phonemizer = _make_espeak_backend(
                language, punctuation_marks, preserve_punctuation,
                with_stress, tie, language_switch, words_mismatch)
        elif backend in ("pypinyin", "pypinyin_initials_finals"):
            phonemizer = PypinyinBackend(
                backend=backend,
                punctuation_marks=punctuation_marks + separator.word)
        elif backend == "char":
            phonemizer = CharBackend(punctuation_marks=punctuation_marks)
        else:
            raise NotImplementedError(f"{backend}")
        self.backend = phonemizer
        self.separator = separator

    def to_list(self, phonemized: str) -> List[str]:
        fields = []
        for word in phonemized.split(self.separator.word):
            pp = re.findall(r"\w+|[^\w\s]", word, re.UNICODE)
            fields.extend(
                [p for p in pp if p != self.separator.phone]
                + [self.separator.word])
        assert len("".join(fields[:-1])) == len(phonemized) - phonemized.count(
            self.separator.phone)
        return fields[:-1]

    def __call__(self, text, strip: bool = True) -> List[List[str]]:
        if isinstance(text, str):
            text = [text]
        phonemized = self.backend.phonemize(
            text, separator=self.separator, strip=strip, njobs=1)
        return [self.to_list(p) for p in phonemized]


def tokenize_text(tokenizer: TextTokenizer, text: str) -> List[str]:
    return tokenizer([text.strip()])[0]


# ---------------------------------------------------------------------------
# Audio tokenizer (EnCodec-on-TPU)
# ---------------------------------------------------------------------------


class AudioTokenizer:
    """EnCodec audio tokenizer on the JAX codec (reference :211-242).

    Pretrained weights load from ``weights_path`` (a torch EnCodec 24 kHz
    state dict / checkpoint file) or the ``VALLE_TPU_ENCODEC_WEIGHTS`` env
    var; without weights the codec is random-initialized (tokens are
    structurally valid but not audio-faithful — fine for pipeline tests).
    """

    def __init__(self, weights_path: Optional[str] = None,
                 bandwidth: float = 6.0) -> None:
        import os

        import jax

        from ..codec import EncodecConfig, init_encodec, load_encodec_torch

        self.config = EncodecConfig()
        self.sample_rate = self.config.sample_rate
        self.channels = self.config.channels
        self.n_q = self.config.n_q_for_bandwidth(bandwidth)
        weights_path = weights_path or os.environ.get(
            "VALLE_TPU_ENCODEC_WEIGHTS")
        if weights_path:
            self.params = load_encodec_torch(weights_path)
            self.pretrained = True
        else:
            self.params = init_encodec(jax.random.PRNGKey(0), self.config)
            self.pretrained = False

    def encode(self, wav: np.ndarray) -> np.ndarray:
        """wav: (B, T) or (B, T, 1) float32 -> codes (B, F, n_q) int32."""
        import jax.numpy as jnp

        from ..codec import encodec_encode

        wav = np.asarray(wav, np.float32)
        if wav.ndim == 2:
            wav = wav[..., None]
        codes = encodec_encode(self.params, jnp.asarray(wav),
                               cfg=self.config, n_q=self.n_q)
        return np.asarray(codes)

    def decode(self, codes: np.ndarray,
               dtype: Optional[str] = None,
               transfer: str = "float32") -> np.ndarray:
        """codes: (B, F, n_q) -> wav (B, F*320) float32.

        ``dtype="bfloat16"`` runs the decoder in bf16 (see
        ``encodec_decode``); default fp32.

        ``transfer="pcm16"`` quantizes the waveform to int16 PCM ON
        DEVICE and transfers 2 bytes/sample instead of 4 — the
        device->host copy dominates batched decode wall time (measured
        ~43 MB/s effective over the tunnel, BASELINE.md round 3), and
        wav files store 16-bit PCM anyway, so the quantization is
        invisible in the written artifact. Still returns float32 in
        [-1, 1] (dequantized on host).
        """
        import jax.numpy as jnp

        from ..codec import encodec_decode

        wav = encodec_decode(
            self.params, jnp.asarray(codes), cfg=self.config,
            dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
        if transfer == "pcm16":
            q = jnp.clip(jnp.round(wav[..., 0] * 32767.0),
                         -32768.0, 32767.0).astype(jnp.int16)
            return np.asarray(q).astype(np.float32) / 32767.0
        if transfer != "float32":
            raise ValueError(
                f"transfer must be 'float32'|'pcm16': {transfer!r}")
        return np.asarray(wav)[..., 0]


def tokenize_audio(tokenizer: AudioTokenizer, audio_path: str) -> np.ndarray:
    """Load a wav, convert to 24 kHz mono, EnCodec-encode.

    Returns codes (1, F, n_q) (reference tokenize_audio, :245-254).
    """
    from .. import native

    wav, sr = native.read_wav(audio_path)
    mono = native.convert_audio(wav, sr, tokenizer.sample_rate, 1)
    return tokenizer.encode(mono[None, :])


# ---------------------------------------------------------------------------
# Feature-extractor plugin (offline tokenization pipeline)
# ---------------------------------------------------------------------------


@dataclass
class AudioTokenConfig:
    frame_shift: float = 320.0 / 24000
    num_quantizers: int = 8

    def to_dict(self) -> Dict[str, Any]:
        return asdict(self)

    @staticmethod
    def from_dict(data: Dict[str, Any]) -> "AudioTokenConfig":
        return AudioTokenConfig(**data)


def compute_num_frames(duration: float, frame_shift: float,
                       sampling_rate: int) -> int:
    """lhotse-compatible frame count (rounded sample-accurate)."""
    num_samples = round(duration * sampling_rate)
    window_hop = round(frame_shift * sampling_rate)
    return int((num_samples + window_hop // 2) // window_hop)


class AudioTokenExtractor:
    """Batch EnCodec code extraction (reference :270-361).

    name="encodec"; features are (T, num_quantizers) int arrays trimmed to
    the lhotse-compatible frame count.
    """

    name = "encodec"
    config_type = AudioTokenConfig

    def __init__(self, config: Optional[AudioTokenConfig] = None,
                 weights_path: Optional[str] = None):
        self.config = config or AudioTokenConfig()
        self.tokenizer = AudioTokenizer(weights_path=weights_path)

    @property
    def frame_shift(self) -> float:
        return self.config.frame_shift

    def feature_dim(self, sampling_rate: int) -> int:
        return self.config.num_quantizers

    def extract(self, samples: np.ndarray, sampling_rate: int) -> np.ndarray:
        from .. import native

        samples = np.asarray(samples, np.float32)
        if samples.ndim == 2:  # (channels, T) torchaudio-style
            samples = native.to_mono(samples.T)
        if sampling_rate != self.tokenizer.sample_rate:
            samples = native.resample(samples, sampling_rate,
                                      self.tokenizer.sample_rate)
            sampling_rate = self.tokenizer.sample_rate
        codes = self.tokenizer.encode(samples[None])  # (1, F, Q)
        duration = round(samples.shape[-1] / sampling_rate, ndigits=12)
        expected = compute_num_frames(duration, self.frame_shift,
                                      sampling_rate)
        assert abs(codes.shape[1] - expected) <= 1, (codes.shape, expected)
        return codes[0, :expected].astype(np.int16)

    def extract_batch(self, samples: List[np.ndarray],
                      sampling_rate: int) -> List[np.ndarray]:
        """Pad to a batch, encode once on-device, trim per-utterance."""
        from .. import native

        waves = []
        for w in samples:
            w = np.asarray(w, np.float32).reshape(-1)
            if sampling_rate != self.tokenizer.sample_rate:
                w = native.resample(w, sampling_rate,
                                    self.tokenizer.sample_rate)
            waves.append(w)
        sr = self.tokenizer.sample_rate
        lengths = [len(w) for w in waves]
        T = max(lengths)
        batch = np.zeros((len(waves), T), np.float32)
        for i, w in enumerate(waves):
            batch[i, : len(w)] = w
        codes = self.tokenizer.encode(batch)  # (B, F, Q)
        out = []
        for i, n in enumerate(lengths):
            duration = round(n / sr, ndigits=12)
            expected = compute_num_frames(duration, self.frame_shift, sr)
            out.append(codes[i, :expected].astype(np.int16))
        return out
