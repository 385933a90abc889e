"""Two-stage vision encoder ("DeepEncoder"-style optical compressor).

Implements the architecture idea the reference app is built around (its
sample document describes it; the reference itself outsourced vision to a
cloud API, reference backend/app/pipeline/pdf_extract.py:146-166): high-
resolution page rasters are processed by cheap *windowed* attention at high
token count, then convolutionally downsampled 4x per side (16x fewer tokens)
before *global* attention — keeping activation memory low while emitting a
small number of information-dense vision tokens per page (the "optical
context compression").

Input is the (B, grid*grid, patch*patch*3) patch-token tensor produced by the
fused Pallas preprocessing kernel (ops/preprocess.py).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .configs import VisionConfig
from .layers import Attention, RMSNorm, SwiGLU, _dtype, dense_init


class EncoderBlock(nn.Module):
    dim: int
    heads: int
    dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x, kv_len=None):
        head_dim = self.dim // self.heads
        h = RMSNorm(name="norm1")(x)
        h = Attention(
            heads=self.heads,
            kv_heads=self.heads,
            head_dim=head_dim,
            out_dim=self.dim,
            causal=False,
            rope=False,
            dtype=self.dtype,
            name="attn",
        )(h, kv_len=kv_len)
        x = x + h
        h = RMSNorm(name="norm2")(x)
        h = SwiGLU(hidden=self.dim * 4, dtype=self.dtype, name="mlp")(h)
        return x + h


class VisionEncoder(nn.Module):
    cfg: VisionConfig

    @nn.compact
    def __call__(self, patch_tokens: jnp.ndarray) -> jnp.ndarray:
        """(B, grid*grid, patch*patch*3) -> (B, tokens_out, dim_global)."""
        cfg = self.cfg
        dt = _dtype(cfg.dtype)
        b, p, _ = patch_tokens.shape
        grid = cfg.grid
        assert p == grid * grid, (p, grid)

        x = nn.Dense(
            cfg.dim_local, use_bias=True, dtype=dt,
            kernel_init=dense_init("patch", "embed"), name="patch_embed",
        )(patch_tokens)
        pos = self.param(
            "pos_embed",
            nn.with_partitioning(
                nn.initializers.normal(stddev=0.02), (None, None)
            ),
            (grid * grid, cfg.dim_local),
        )
        x = x + pos.astype(dt)[None]

        # Stage 1: windowed attention over (window x window) patch tiles.
        # Remat: at 1024px input there are 4096 stage-1 tokens per page;
        # recomputing block activations in backward keeps training in HBM.
        Block = nn.remat(EncoderBlock, prevent_cse=False)
        win = min(cfg.window, grid)
        nw = grid // win
        for i in range(cfg.depth_local):
            xw = x.reshape(b, nw, win, nw, win, cfg.dim_local)
            xw = jnp.transpose(xw, (0, 1, 3, 2, 4, 5)).reshape(
                b * nw * nw, win * win, cfg.dim_local
            )
            xw = Block(
                dim=cfg.dim_local, heads=cfg.heads_local, dtype=cfg.dtype,
                name=f"local_{i}",
            )(xw)
            xw = xw.reshape(b, nw, nw, win, win, cfg.dim_local)
            x = jnp.transpose(xw, (0, 1, 3, 2, 4, 5)).reshape(
                b, grid * grid, cfg.dim_local
            )

        # Token-grid downsample: strided conv, the 16x "optical compression".
        ds = cfg.downsample
        x2d = x.reshape(b, grid, grid, cfg.dim_local)
        x2d = nn.Conv(
            cfg.dim_global, kernel_size=(ds, ds), strides=(ds, ds),
            padding="VALID", dtype=dt,
            kernel_init=dense_init(None, None, None, "embed"),
            name="downsample",
        )(x2d)
        side = grid // ds
        x = x2d.reshape(b, side * side, cfg.dim_global)

        # Stage 2: global attention over the compressed token set.
        for i in range(cfg.depth_global):
            x = Block(
                dim=cfg.dim_global, heads=cfg.heads_global, dtype=cfg.dtype,
                name=f"global_{i}",
            )(x)
        return RMSNorm(name="norm_out")(x)
