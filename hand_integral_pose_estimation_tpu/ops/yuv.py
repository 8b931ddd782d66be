"""Device-side YUV 4:2:0 -> RGB conversion, bit-exact with libjpeg.

The native loader's YUV mode (native/hipe_io.cpp `decode_jpeg_file_yuv420`)
stops the host decode at the planar subsampled representation the JPEG file
already stores — skipping the two most expensive host stages (chroma
upsampling + color conversion) and halving host->device bytes (1.5 B/px vs
3 B/px against the measured ~38 MB/s dev-tunnel H2D ceiling / production
PCIe). This module finishes the decode on the accelerator with an EXACT
integer emulation of libjpeg's default path, so the RGB pixels are bitwise
identical to the full-host decode the rest of the framework was gated
against:

* chroma upsampling: `h2v2_fancy_upsample` (jdsample.c) — the 3/4+1/4
  triangle filter in each dimension with the library's exact alternating
  +8/+7 rounding and edge replication;
* color conversion: `ycc_rgb_convert` (jdcolor.c) — the SCALEBITS=16
  fixed-point tables (FIX(1.40200)=91881, FIX(1.77200)=116130,
  FIX(0.34414)=22554, FIX(0.71414)=46802) with ONE_HALF rounding and the
  0..255 range limit.

Everything is elementwise int32 VPU work that XLA fuses into the consuming
program; at batch-32 224^2 it is sub-millisecond against the multi-ms H2D
it saves. Plays the role of cv2.imread's upsample/color stages in the
reference's loader (reference: data/dataset.py:109 via cv2; the reference
has no subsampled transport at all).
"""

from __future__ import annotations

import jax.numpy as jnp


def planar_sizes(height: int, width: int) -> tuple[int, int, int]:
    """(y, cb, cr) plane lengths of a packed 4:2:0 image."""
    if height % 2 or width % 2:
        raise ValueError("4:2:0 needs even dims, got %dx%d" % (height, width))
    c = (height // 2) * (width // 2)
    return height * width, c, c


def upsample_h2v2_fancy(c: jnp.ndarray) -> jnp.ndarray:
    """libjpeg `h2v2_fancy_upsample`: (B, ch, cw) uint8 -> (B, 2ch, 2cw).

    Triangle filter (9/16, 3/16, 3/16, 1/16), edge-replicated, with the
    library's exact integer rounding: even output columns round with +8,
    odd with +7 (jdsample.c). Edge replication makes the first/last-column
    special cases ((sum*4+8)>>4 / (sum*4+7)>>4) fall out of the general
    formula.
    """
    c = c.astype(jnp.int32)
    # vertical pass: colsum = 3*nearer + farther (rows 2i pull row i-1,
    # rows 2i+1 pull row i+1; clamped at the image edge)
    up = 3 * c + jnp.concatenate([c[:, :1], c[:, :-1]], axis=1)
    down = 3 * c + jnp.concatenate([c[:, 1:], c[:, -1:]], axis=1)
    cols = jnp.stack([up, down], axis=2).reshape(
        c.shape[0], 2 * c.shape[1], c.shape[2])
    # horizontal pass over the column sums
    left = jnp.concatenate([cols[..., :1], cols[..., :-1]], axis=-1)
    right = jnp.concatenate([cols[..., 1:], cols[..., -1:]], axis=-1)
    even = (3 * cols + left + 8) >> 4
    odd = (3 * cols + right + 7) >> 4
    out = jnp.stack([even, odd], axis=-1).reshape(
        c.shape[0], 2 * c.shape[1], 2 * c.shape[2])
    return out.astype(jnp.uint8)


def ycc_to_rgb(y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray
               ) -> jnp.ndarray:
    """libjpeg `ycc_rgb_convert` on full-resolution planes -> (..., 3) uint8.

    Fixed-point per jdcolor.c build_ycc_rgb_table: SCALEBITS=16,
    ONE_HALF=32768, arithmetic right shifts (jnp's int32 >> is arithmetic).
    """
    yi = y.astype(jnp.int32)
    cbi = cb.astype(jnp.int32) - 128
    cri = cr.astype(jnp.int32) - 128
    r = yi + ((91881 * cri + 32768) >> 16)
    b = yi + ((116130 * cbi + 32768) >> 16)
    g = yi + ((-22554 * cbi + 32768 - 46802 * cri) >> 16)
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb, 0, 255).astype(jnp.uint8)


def yuv420_to_rgb(packed: jnp.ndarray, height: int, width: int
                  ) -> jnp.ndarray:
    """Packed planar 4:2:0 batches -> RGB, bitwise libjpeg-equal.

    `packed` is (B, h*w*3//2) uint8 as produced by the native loader's YUV
    mode: Y plane, then Cb (h/2, w/2), then Cr. Returns (B, h, w, 3) uint8.
    """
    ny, ncb, _ = planar_sizes(height, width)
    ch, cw = height // 2, width // 2
    b = packed.shape[0]
    y = packed[:, :ny].reshape(b, height, width)
    cb = packed[:, ny:ny + ncb].reshape(b, ch, cw)
    cr = packed[:, ny + ncb:].reshape(b, ch, cw)
    return ycc_to_rgb(y, upsample_h2v2_fancy(cb), upsample_h2v2_fancy(cr))
