"""Text encoding for visual grounding.

The reference uses a frozen HuggingFace RoBERTa + fast tokenizer
(``sparse_featfusion_grounder.py:18,107-109``; frozen via lr_mult=0 at
``configs/grounding/mv-grounding...py:199``). Here:

- The encoder is the *Flax* RoBERTa module (same architecture), configurable
  down to tiny sizes for tests; freezing is an optimizer mask.
- Tokenization stays host-side. With no network access there is no pretrained
  vocab, so ``SimpleTokenizer`` provides a deterministic whitespace/punct
  tokenizer with ``char_to_token`` support (the only tokenizer API the
  reference relies on, for positive-map construction). A real
  ``RobertaTokenizerFast`` drops in unchanged when vocab files are available.
"""

import re
from typing import Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_TOKEN_RE = re.compile(r"\w+|[^\w\s]")


class SimpleTokenizer:
    """Deterministic offline tokenizer with char_to_token support."""

    def __init__(self, vocab_size: int = 30522, max_len: int = 256):
        self.vocab_size = vocab_size
        self.max_len = max_len
        self.bos, self.eos, self.pad = 0, 2, 1  # roberta conventions

    def _hash(self, word: str) -> int:
        h = 5381
        for ch in word.lower():
            h = ((h * 33) ^ ord(ch)) & 0x7FFFFFFF
        return 4 + h % (self.vocab_size - 4)

    def __call__(self, texts: List[str]) -> Dict[str, np.ndarray]:
        b = len(texts)
        ids = np.full((b, self.max_len), self.pad, np.int32)
        mask = np.zeros((b, self.max_len), bool)
        self._char_maps = []
        for i, text in enumerate(texts):
            toks = [(m.group(0), m.start(), m.end())
                    for m in _TOKEN_RE.finditer(text)]
            toks = toks[:self.max_len - 2]
            ids[i, 0] = self.bos
            char_map = np.full(len(text), -1, np.int64)
            for j, (w, s, e) in enumerate(toks):
                ids[i, j + 1] = self._hash(w)
                char_map[s:e] = j + 1
            ids[i, len(toks) + 1] = self.eos
            mask[i, :len(toks) + 2] = True
            self._char_maps.append(char_map)
        return dict(input_ids=ids, attention_mask=mask.astype(np.int32))

    def char_to_token(self, batch_idx: int, char_idx: int):
        cm = self._char_maps[batch_idx]
        if char_idx < 0 or char_idx >= len(cm) or cm[char_idx] < 0:
            return None
        return int(cm[char_idx])


class HFTokenizer:
    """``RobertaTokenizerFast`` from local vocab files, same API surface.

    The reference tokenizes with
    ``RobertaTokenizerFast.from_pretrained('roberta-base')``
    (sparse_featfusion_grounder.py:108, :475-479 batch_encode_plus with
    padding); point ``path`` at a directory holding the downloaded
    vocab.json/merges.txt/tokenizer.json to reproduce its token ids exactly.
    """

    def __init__(self, path: str, max_len: int = 256):
        from transformers import RobertaTokenizerFast
        self.tok = RobertaTokenizerFast.from_pretrained(path)
        self.vocab_size = self.tok.vocab_size
        self.max_len = max_len

    def __call__(self, texts: List[str]) -> Dict[str, np.ndarray]:
        enc = self.tok(texts, padding='max_length', truncation=True,
                       max_length=self.max_len, return_tensors='np')
        self._enc = enc
        return dict(input_ids=enc['input_ids'].astype(np.int32),
                    attention_mask=enc['attention_mask'].astype(np.int32))

    def char_to_token(self, batch_idx: int, char_idx: int):
        return self._enc.char_to_token(batch_idx, char_idx)


def get_tokenizer(path, max_len: int):
    """HF fast tokenizer when vocab files exist locally, else the hash
    tokenizer (offline fallback)."""
    if path:
        try:
            return HFTokenizer(path, max_len=max_len)
        except Exception as e:  # noqa: BLE001 - fall back offline
            import warnings
            warnings.warn(f'HF tokenizer unavailable ({e}); '
                          'using SimpleTokenizer')
    return SimpleTokenizer(max_len=max_len)


def build_positive_maps(tokenizer, texts: List[str],
                        tokens_positive: List[List[List[List[int]]]],
                        max_text_len: int, max_boxes: int) -> np.ndarray:
    """Char spans -> normalized (B, max_boxes, max_text_len) token maps.

    Mirrors ``create_positive_map`` (sparse_featfusion_grounder.py:570-621):
    a box's row has 1s on its span tokens, normalized by the count.
    """
    b = len(texts)
    out = np.zeros((b, max_boxes, max_text_len), np.float32)
    for i in range(b):
        for j, spans in enumerate(tokens_positive[i][:max_boxes]):
            for beg, end in spans:
                beg_pos = tokenizer.char_to_token(i, beg)
                end_pos = tokenizer.char_to_token(i, end - 1)
                if beg_pos is None:
                    beg_pos = tokenizer.char_to_token(i, beg + 1)
                    if beg_pos is None:
                        beg_pos = tokenizer.char_to_token(i, beg + 2)
                if end_pos is None:
                    end_pos = tokenizer.char_to_token(i, end - 2)
                    if end_pos is None:
                        end_pos = tokenizer.char_to_token(i, end - 3)
                if beg_pos is None or end_pos is None:
                    continue
                out[i, j, beg_pos:end_pos + 1] = 1.0
        sums = out[i].sum(-1, keepdims=True)
        out[i] = out[i] / (sums + 1e-6)
    return out


class TextEncoder(nn.Module):
    """RoBERTa-architecture text encoder + projection to embed_dims.

    Args:
        arch: 'roberta' uses the HF Flax RoBERTa module (architecture parity
            with the reference); 'tiny' uses a small in-repo transformer for
            fast tests.
    """

    embed_dims: int = 256
    arch: str = 'roberta'
    vocab_size: int = 30522
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    # The reference freezes the text encoder via lr_mult=0.0
    # (configs/grounding/mv-grounding...py:199) — parameters never update, but
    # torch still runs the full RoBERTa backward to produce the zeroed grads.
    # Here frozen=True cuts the gradient at the encoder output instead:
    # identical training semantics (the trailing text_feat_map projection
    # stays trainable, matching the reference's separate Linear at
    # sparse_featfusion_grounder.py:113-116) with no 12-layer backward.
    frozen: bool = True

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic: bool = True):
        if self.arch == 'roberta':
            from transformers import RobertaConfig
            from transformers.models.roberta.modeling_flax_roberta import \
                FlaxRobertaModule
            cfg = RobertaConfig(
                vocab_size=self.vocab_size, hidden_size=self.hidden,
                num_hidden_layers=self.layers,
                num_attention_heads=self.heads,
                intermediate_size=self.hidden * 4,
                max_position_embeddings=514, type_vocab_size=1)
            encoder = FlaxRobertaModule(cfg, add_pooling_layer=False)
            hidden = encoder(
                input_ids=input_ids,
                attention_mask=attention_mask,
                token_type_ids=jnp.zeros_like(input_ids),
                position_ids=jnp.cumsum(attention_mask, -1) * attention_mask
                + 1,
                deterministic=deterministic).last_hidden_state
        else:  # tiny in-repo transformer
            x = nn.Embed(self.vocab_size, self.hidden)(input_ids)
            mask = attention_mask[:, None, None, :] > 0
            for _ in range(self.layers):
                y = nn.LayerNorm()(x)
                y = nn.MultiHeadDotProductAttention(
                    num_heads=self.heads, qkv_features=self.hidden)(
                        y, y, mask=mask)
                x = x + y
                y = nn.LayerNorm()(x)
                y = nn.Dense(self.hidden * 4)(y)
                y = nn.relu(y)
                x = x + nn.Dense(self.hidden)(y)
            hidden = nn.LayerNorm()(x)
        if self.frozen:
            hidden = jax.lax.stop_gradient(hidden)
        # text_feat_map (sparse_featfusion_grounder.py:113-116)
        return nn.Dense(self.embed_dims)(hidden)
