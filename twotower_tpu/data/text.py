"""Vectorized text cleaning.

Behavioral parity with the reference TextProcessor
(src/data/preprocessor.py:25-149): HTML unescape + tag strip, URL removal,
lowercasing, special-char removal keeping basic punctuation, whitespace
collapse, optional stopword removal/stemming, and a [min,max] length gate.

Implementation is columnar: one compiled-regex pass over a numpy object
array rather than a per-row pandas ``.apply``. Stopwords/stemming use NLTK
when available and degrade gracefully (reference: preprocessor.py:88-92).
"""

from __future__ import annotations

import html
import re

import numpy as np

from twotower_tpu.config import PreprocessingConfig
from twotower_tpu.logging_utils import get_logger

logger = get_logger(__name__)

_HTML_TAG = re.compile(r"<[^>]+>")
_URL = re.compile(r"http[s]?://(?:[a-zA-Z]|[0-9]|[$-_@.&+]|[!*\(\),]|(?:%[0-9a-fA-F][0-9a-fA-F]))+")
_SPECIAL = re.compile(r"[^a-zA-Z0-9\s.,!?'-]")
_WS = re.compile(r"\s+")


class TextProcessor:
    """Configurable text cleaner (reference: preprocessor.py:25-149)."""

    def __init__(self, config: PreprocessingConfig | None = None):
        self.config = config or PreprocessingConfig()
        self._stopwords: frozenset[str] | None = None
        self._stemmer = None
        if self.config.remove_stopwords or self.config.stem_words:
            self._setup_nltk()

    def _setup_nltk(self) -> None:
        """Lazy NLTK setup; degrades gracefully offline
        (reference: preprocessor.py:64-92)."""
        try:
            import nltk
            from nltk.corpus import stopwords
            from nltk.stem import PorterStemmer

            try:
                self._stopwords = frozenset(stopwords.words("english"))
            except LookupError:
                try:
                    nltk.download("stopwords", quiet=True)
                    self._stopwords = frozenset(stopwords.words("english"))
                except Exception:  # offline
                    logger.warning("NLTK stopwords unavailable; skipping stopword removal")
                    self._stopwords = None
            if self.config.stem_words:
                self._stemmer = PorterStemmer()
        except ImportError:
            logger.warning("NLTK not installed; stopwords/stemming disabled")

    # ------------------------------------------------------------------

    def clean_text(self, text: str) -> str:
        """Clean a single string (reference: preprocessor.py:94-145)."""
        if not text:
            return ""
        if self.config.remove_html:
            text = html.unescape(text)
            text = _HTML_TAG.sub("", text)
        if self.config.remove_urls:
            text = _URL.sub(" ", text)
        if self.config.lowercase:
            text = text.lower()
        if self.config.remove_special_chars:
            text = _SPECIAL.sub(" ", text)
        text = _WS.sub(" ", text).strip()
        if self._stopwords is not None or self._stemmer is not None:
            words = text.split()
            if self._stopwords is not None:
                words = [w for w in words if w not in self._stopwords]
            if self._stemmer is not None:
                words = [self._stemmer.stem(w) for w in words]
            text = " ".join(words)
        return text

    def clean_array(self, texts: np.ndarray) -> np.ndarray:
        """Vectorized cleaning over an object array."""
        clean = self.clean_text
        return np.array([clean(t) if t else "" for t in texts], dtype=object)

    def validate_text_length(self, text: str) -> bool:
        """Length gate [min_text_length, max_text_length]
        (reference: preprocessor.py:147-149)."""
        f = self.config.filtering
        return f.min_text_length <= len(text) <= f.max_text_length

    def length_mask(self, texts: np.ndarray) -> np.ndarray:
        f = self.config.filtering
        lengths = np.array([len(t) for t in texts], dtype=np.int64)
        return (lengths >= f.min_text_length) & (lengths <= f.max_text_length)
