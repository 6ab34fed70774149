"""T5 text conditioning — JAX encoder inference + caption cleaning.

Capability parity with reference language/t5.py: `T5Embedder` wrapping an
encoder-only T5 (flan-t5-xl / t5-v1_1-xl/xxl), max_length-120 tokenization
with attention mask, and the two-pass caption-cleaning pipeline
(t5.py:96-203). Here the encoder runs as a Flax model under jit on TPU
(HF `FlaxT5EncoderModel`); weights load from a local directory (this
environment has no network egress).
"""

from __future__ import annotations

import html
import os
import re
import urllib.parse as ul
from typing import List, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Caption cleaning (reference t5.py:96-203 pipeline, same normalization goals:
# strip urls/html/handles, normalize unicode punctuation, collapse repeats)
# ---------------------------------------------------------------------------

_BAD_PUNCT = re.compile(r"[#®•©™&@·º½¾¿¡§~\)\(\]\[\}\{\|\\/\*]{1,}")
_URL = re.compile(r"\b((?:https?|www)\S+)", flags=re.IGNORECASE)
_HTML_TAG = re.compile(r"<[^>]+>")
_HANDLE = re.compile(r"@[\w\d]+\b")
_UNICODE_BLOCKS = re.compile(
    "[" "\u31c0-\u31ef\u31f0-\u31ff\u3200-\u32ff\u3300-\u33ff\u3400-\u4dbf"
    "\u4dc0-\u4dff\u4e00-\u9fff\ua000-\ua48f\ua490-\ua4cf" "]+")
_DOUBLE_QUOTES = re.compile(r"[`´«»“”¨]")
_SINGLE_QUOTES = re.compile(r"[‘’]")
_MULTI_DOT = re.compile(r"\.{2,}")
_DATES = re.compile(r"\d:\d\d\s+$")
_CJK_PUNCT = re.compile(r"[\u31fb-\u31ff]+")
_WHITESPACE = re.compile(r"\s+")
_QUOTES_COUNT = re.compile(r'["\']')
_DUP_PUNCT = re.compile(r"([,;:\.\?\!])\1+")
_IDS = re.compile(r"\b[a-zA-Z]{1,3}\d{3,15}\b|\b[a-zA-Z]+\d+[a-zA-Z]+\b|"
                  r"\b\d+[a-zA-Z]+\d+\b")
_HASH_START = re.compile(r"^[\#\d]+")


def basic_clean(text: str) -> str:
    try:
        import ftfy
        text = ftfy.fix_text(text)
    except ImportError:
        pass
    return html.unescape(html.unescape(text)).strip()


def clean_caption(caption: str) -> str:
    """One cleaning pass (ref t5.py:100-199)."""
    caption = str(caption)
    caption = ul.unquote_plus(caption)
    caption = caption.strip().lower()
    caption = _URL.sub("", caption)
    caption = basic_clean(caption)
    caption = _HTML_TAG.sub("", caption)
    caption = _HANDLE.sub("", caption)
    caption = _UNICODE_BLOCKS.sub("", caption)
    caption = _DOUBLE_QUOTES.sub('"', caption)
    caption = _SINGLE_QUOTES.sub("'", caption)
    caption = _MULTI_DOT.sub(" ", caption)
    caption = _BAD_PUNCT.sub(r" ", caption)
    if len(_QUOTES_COUNT.findall(caption)) > 3:
        caption = _QUOTES_COUNT.sub("", caption)
    caption = _DATES.sub("", caption)
    caption = _IDS.sub("", caption)
    caption = _DUP_PUNCT.sub(r"\1", caption)
    caption = _HASH_START.sub("", caption)
    caption = _WHITESPACE.sub(" ", caption)
    return caption.strip()


def text_preprocessing(text: str, use_clean: bool = True) -> str:
    """Two cleaning passes, like the reference (t5.py:85-93)."""
    if use_clean:
        return clean_caption(clean_caption(text))
    return text.lower().strip()


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

class T5Embedder:
    """Encoder-only T5 in JAX (ref language/t5.py:15-81 API).

    `dir_or_name` must be a local path (zero-egress environment). Loads the
    HF Flax weights when available, else converts the PyTorch ones.
    """

    available_models = ["t5-v1_1-xxl", "t5-v1_1-xl", "flan-t5-xl"]

    def __init__(self, dir_or_name: str, model_max_length: int = 120,
                 dtype: str = "bfloat16", use_text_preprocessing: bool = True):
        self.model_max_length = model_max_length
        self.use_text_preprocessing = use_text_preprocessing
        self._tokenizer = None
        self._model = None
        self._dir = dir_or_name
        self._dtype = dtype

    @property
    def tokenizer(self):
        if self._tokenizer is None:
            from transformers import AutoTokenizer
            self._tokenizer = AutoTokenizer.from_pretrained(self._dir)
        return self._tokenizer

    def _load_model(self):
        if self._model is None:
            import jax.numpy as jnp
            from transformers import FlaxT5EncoderModel
            self._model = FlaxT5EncoderModel.from_pretrained(
                self._dir, dtype=jnp.dtype(self._dtype), from_pt=True)
        return self._model

    def tokenize(self, texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        texts = [text_preprocessing(t, self.use_text_preprocessing)
                 for t in texts]
        enc = self.tokenizer(
            texts, max_length=self.model_max_length, padding="max_length",
            truncation=True, return_attention_mask=True,
            add_special_tokens=True, return_tensors="np")
        return enc["input_ids"], enc["attention_mask"]

    def embed_token_ids(self, input_ids: np.ndarray, attn: np.ndarray):
        """Pre-tokenized ids -> embeddings (B, L, d_model)."""
        model = self._load_model()
        out = model(input_ids=input_ids, attention_mask=attn)
        return np.asarray(out.last_hidden_state)

    def get_text_embeddings(self, texts: List[str]):
        """texts -> (embeddings (B, 120, d_model), attention_mask (B, 120))."""
        input_ids, attn = self.tokenize(texts)
        return self.embed_token_ids(input_ids, attn), attn


def dump_features(embedder: T5Embedder, captions: List[str], out_paths: List[str],
                  shard_id: int = 0, num_shards: int = 1,
                  batch_size: int = 0):
    """Offline feature extraction writing one (1, L, D) npy per caption,
    trimmed to the real token count (ref language/extract_t5_feature.py).

    Sharded like the reference's rank split (extract_t5_feature.py:1-50:
    each rank takes a contiguous chunk of the caption list): shard `shard_id`
    of `num_shards` processes captions[lo:hi] and skips already-written
    outputs, so N independent processes (or a resumed one) cover the set.
    `batch_size` > 0 embeds in chunks instead of one giant batch."""
    n = len(captions)
    per = (n + num_shards - 1) // num_shards
    lo, hi = shard_id * per, min(n, (shard_id + 1) * per)
    captions, out_paths = captions[lo:hi], out_paths[lo:hi]
    todo = [(c, p) for c, p in zip(captions, out_paths)
            if not os.path.exists(p)]
    step = batch_size if batch_size > 0 else max(1, len(todo))
    for i in range(0, len(todo), step):
        chunk = todo[i:i + step]
        embs, masks = embedder.get_text_embeddings([c for c, _ in chunk])
        for emb, mask, (_, path) in zip(embs, masks, chunk):
            np.save(path, emb[None, : int(mask.sum())].astype(np.float32))
