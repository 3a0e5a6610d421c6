"""DVGTformer: dual (temporal/spatial) graph-prior transformer.

Reference DVGTformer_model (models/DVGTformer/Model.py:113-174). Virtual
node appended on both axes; PCC similarity of the *embedded* input serves as
an attention prior mixed into softmax scores via ``lambda``; alternating
temporal/spatial transformer blocks.

Quirks preserved:
  - the positional encoding loop uses exponent ``2i/d`` with i the raw even
    index (not i/2), and leaves the last column zero when d is odd (:143-149)
  - attention applies a SECOND softmax over the mixed scores (:59,:103)
  - residuals add X *after* LayerNorm (post-LN of the sublayer output only)
  - the temporal block applies dropout after its residual; the spatial block
    defines dropout but never applies it (:64 vs :106-110)
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn.basic import Linear, LinearParams, Dropout
from ..ops.graphs import pearson_graph


def _dvgt_positional_encoding(n: int, d_model: int) -> np.ndarray:
    """Handwritten PE loop (models/DVGTformer/Model.py:143-149)."""
    pe = np.zeros((n, d_model))
    for pos in range(n):
        for i in range(0, d_model - 1, 2):
            pe[pos, i] = np.sin(pos / (10000 ** ((2 * i) / d_model)))
            pe[pos, i + 1] = np.cos(pos / (10000 ** ((2 * i) / d_model)))
    return pe


class VGTBlock(nn.Module):
    """One graph-prior transformer block (TVGTformer/SVGTformer,
    models/DVGTformer/Model.py:26-110). ``model_dim`` is the token feature
    width (num_nodes+1 or time_length+1)."""
    model_dim: int
    d_model: int
    num_heads: int
    lambda_param: float
    d_ff: int
    dropout: float
    apply_dropout: bool  # temporal block: True; spatial: False

    @nn.compact
    def __call__(self, x, a_prior, train: bool = False):
        prior = jax.nn.softmax(nn.relu(a_prior), axis=-1)
        # All heads batched into stacked einsums (param tree and numerics
        # identical to per-head Linears; one MXU dispatch per projection
        # instead of num_heads).
        d_in = x.shape[-1]
        def stacked(tag):
            ps = [LinearParams(self.d_model, name=f"{tag}{i}")(d_in)
                  for i in range(self.num_heads)]
            return (jnp.stack([k for k, _ in ps]),
                    jnp.stack([b for _, b in ps]))
        (wq, bq), (wk, bk), (wv, bv) = (stacked(t) for t in ("q", "k", "v"))
        q = jnp.einsum("bnd,hdm->bhnm", x, wq) + bq[None, :, None]
        k = jnp.einsum("bnd,hdm->bhnm", x, wk) + bk[None, :, None]
        v = jnp.einsum("bnd,hdm->bhnm", x, wv) + bv[None, :, None]
        scores = jnp.einsum("bhnd,bhmd->bhnm", q, k) / np.sqrt(self.d_model)
        attn = ((1.0 - self.lambda_param) * jax.nn.softmax(scores, axis=-1)
                + self.lambda_param * prior[:, None])
        # Reference applies softmax AGAIN over the mixed attention.
        attn = jax.nn.softmax(attn, axis=-1)
        out_h = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        # concat in head order == (B, N, H, D) reshape
        cat = jnp.swapaxes(out_h, 1, 2).reshape(
            x.shape[0], x.shape[1], self.num_heads * self.d_model)
        out = Linear(self.model_dim, name="W_O")(cat)
        out = nn.LayerNorm(name="layer_norm1")(out) + x
        if self.apply_dropout:
            out = Dropout(self.dropout, name="dropout")(out, train=train)
        ff = Linear(self.d_ff, name="ff0")(out)
        ff = nn.gelu(ff, approximate=False)
        ff = Linear(self.model_dim, name="ff1")(ff)
        return nn.LayerNorm(name="layer_norm2")(ff) + out


def _randn_init(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


class DVGTformer(nn.Module):
    """Input (B, N, L) -> (B, 1)."""
    num_nodes: int
    time_length: int
    d_model: Sequence[int]
    num_heads: int
    lambda_param: float
    d_ff: Sequence[int]
    dropout: float
    num_blocks: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, l = x.shape
        h = Linear(self.time_length, name="linear_t")(x)
        h = jnp.swapaxes(h, -1, -2)  # (B, L, N)
        h = Linear(self.num_nodes, name="linear_x")(h)

        t_v = self.param("t_v", _randn_init, (1, 1, self.num_nodes))
        x_v = self.param("x_v", _randn_init, (1, self.time_length + 1, 1))
        h = jnp.concatenate(
            [h, jnp.broadcast_to(t_v, (b, 1, self.num_nodes))], axis=1)
        h = jnp.concatenate(
            [h, jnp.broadcast_to(x_v, (b, self.time_length + 1, 1))], axis=-1)

        a_temp = pearson_graph(h)  # (B, L+1, L+1)
        a_spat = pearson_graph(jnp.swapaxes(h, -1, -2))  # (B, N+1, N+1)

        pe = jnp.asarray(_dvgt_positional_encoding(
            self.time_length + 1, self.num_nodes + 1), dtype=h.dtype)
        h = h + pe[None]

        for i in range(self.num_blocks):
            h = VGTBlock(self.num_nodes + 1, self.d_model[0], self.num_heads,
                         self.lambda_param, self.d_ff[0], self.dropout,
                         apply_dropout=True, name=f"tvgt{i}")(
                             h, a_temp, train=train)
            h = jnp.swapaxes(h, 1, 2)
            h = VGTBlock(self.time_length + 1, self.d_model[1], self.num_heads,
                         self.lambda_param, self.d_ff[1], self.dropout,
                         apply_dropout=False, name=f"svgt{i}")(
                             h, a_spat, train=train)
            h = jnp.swapaxes(h, 1, 2)

        h = h.reshape(b, -1)
        h = nn.gelu(Linear(100, name="out0")(h), approximate=False)
        return Linear(1, name="out1")(h)
