"""Text conditioning for training: condition/uncondition pairs + CFG dropout.

Reference: rcm/conditioner.py — frozen `TextCondition` (crossattn_emb +
data_type, :112-115), `TextConditioner`/`TextAttr` mapping the
`t5_text_embeddings` batch key, dropout for classifier-free guidance, and
`get_condition_uncondition` / `..._with_negative_prompt`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class TextCondition:
    """(conditioner.py:112-115). crossattn_emb: (B, L, D_text)."""
    crossattn_emb: jnp.ndarray
    data_type: str = "video"

    def to_dict(self) -> Dict[str, Any]:
        return {"crossattn_emb": self.crossattn_emb}


class TextConditioner:
    """Maps batch['t5_text_embeddings'] to TextCondition with optional CFG
    dropout (zeroing the embedding with prob dropout_rate, the standard
    unconditional-training trick)."""

    def __init__(self, input_key: str = "t5_text_embeddings",
                 dropout_rate: float = 0.0,
                 negative_embedding: Optional[jnp.ndarray] = None):
        self.input_key = input_key
        self.dropout_rate = dropout_rate
        self.negative_embedding = negative_embedding

    def __call__(self, batch: Dict, key: Optional[jax.Array] = None
                 ) -> TextCondition:
        emb = batch[self.input_key]
        if key is not None and self.dropout_rate > 0:
            keep = jax.random.bernoulli(
                key, 1.0 - self.dropout_rate, (emb.shape[0],))
            emb = emb * keep[:, None, None].astype(emb.dtype)
        return TextCondition(crossattn_emb=emb)

    def get_condition_uncondition(self, batch: Dict
                                  ) -> Tuple[TextCondition, TextCondition]:
        """(conditioner.py get_condition_uncondition): uncondition is the
        zero embedding, or a negative-prompt embedding when configured
        (get_condition_uncondition_with_negative_prompt)."""
        cond = self(batch)
        if self.negative_embedding is not None:
            neg = jnp.broadcast_to(
                self.negative_embedding[None],
                cond.crossattn_emb.shape).astype(cond.crossattn_emb.dtype)
            return cond, TextCondition(crossattn_emb=neg)
        return cond, TextCondition(
            crossattn_emb=jnp.zeros_like(cond.crossattn_emb))
