"""nearblack — collar removal, the exact two-pass scanline algorithm of
``apps/nearblack_lib.cpp`` (GDALNearblack).

Semantics re-derived from the reference (ProcessLine,
nearblack_lib.cpp:545-737 and the pass driver :404-535):

* A pixel is "near" a collar color when EVERY band is within
  ``near`` of that color (multiple colors OR together); otherwise it is
  non-black for the check.
* Top-down pass over rows: per line a vertical check (per-column counter
  of non-black pixels seen; a column terminates once its counter exceeds
  ``max_non_black``, and a non-black pixel on the very first line
  terminates the column immediately when max_non_black > 0), then a
  left-to-right horizontal check and a right-to-left one.  The
  horizontal scan replaces until its own running non-black counter
  exceeds max_non_black, re-synchronizing with the column counter inside
  the vertical pass's grey area, with the same first-pixel rule; the
  L->R scan tests columns [0, w-2] and the R->L scan [w-1, 1] (the
  reference's iEnd-exclusive loop).
* Bottom-up pass over the OUTPUT of the first pass, fresh column
  counters, and max_non_black forced to 0 for its horizontal scans.
* Replaced pixels get 255 when a single all-255-leading color is given
  (-white), else 0; the validity mask is zeroed with them.

Replacements here feed the running checks exactly as in the reference:
the vertical check sees the original line values, the horizontal checks
see the line after the vertical replacements of the same ProcessLine
call.
"""

from __future__ import annotations

import numpy as np


def _is_nonblack(line: np.ndarray, colors: np.ndarray, near: int) -> np.ndarray:
    """(w,) bool — True where the pixel is NOT within ``near`` of any
    collar color in every band (nearblack_lib.cpp:586-601)."""
    # line (w, b) int; colors (k, b)
    diff = np.abs(line[None, :, :].astype(np.int64)
                  - colors[:, None, :].astype(np.int64))
    near_any = (diff <= near).all(axis=2).any(axis=0)
    return ~near_any


def nearblack(img: np.ndarray, near: int = 15, max_non_black: int = 2,
              white: bool = False, colors=None):
    """Run GDALNearblack over an (h, w, b) uint8 array.

    Returns (out, mask): out the collar-replaced image, mask (h, w) uint8
    255 where the pixel survived, 0 where it was replaced."""
    a = np.asarray(img)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, b = a.shape
    if colors is None:
        colors = np.full((1, b), 255 if white else 0, dtype=np.int64)
    else:
        colors = np.asarray(colors, dtype=np.int64).reshape(-1, b)
    replace = np.uint8(
        255 if (colors.shape[0] == 1 and colors[0, 0] == 255) else 0)

    out = a.astype(np.uint8).copy()
    mask = np.full((h, w), 255, dtype=np.uint8)

    def process_line(row: int, counts: np.ndarray, line_idx: int,
                     bottom_up: bool):
        line = out[row]
        # ---- vertical check (original line values) --------------------
        nonblack = _is_nonblack(line, colors, near)
        active = counts <= max_non_black
        inc = active & nonblack
        counts[inc] += 1
        over = inc & (counts > max_non_black)
        skip = over.copy()
        if line_idx == 0 and max_non_black > 0:
            first = inc & ~over
            counts[first] = max_non_black + 1
            skip |= first
        rep = active & ~skip
        out[row, rep] = replace
        mask[row, rep] = 0
        # ---- horizontal checks (post-vertical line values) ------------
        hmax = 0 if bottom_up else max_non_black
        for start, stop, step in ((0, w - 1, 1), (w - 1, 0, -1)):
            # one vectorized non-black row per scan: in-scan replacements
            # only touch pixels already behind the pointer
            nb_row = _is_nonblack(out[row], colors, near)
            n_nb = 0
            for i in range(start, stop, step):
                nb = nb_row[i]
                if nb:
                    if counts[i] <= max_non_black:
                        n_nb = counts[i]
                    else:
                        n_nb += 1
                if n_nb > hmax:
                    break
                if nb and hmax > 0 and i == start:
                    break
                out[row, i] = replace
                mask[row, i] = 0

    counts = np.zeros(w, dtype=np.int64)
    for r in range(h):
        process_line(r, counts, r, bottom_up=False)
    counts[:] = 0
    for r in range(h - 1, -1, -1):
        process_line(r, counts, h - 1 - r, bottom_up=True)

    if b == 1 and img.ndim == 2:
        return out[:, :, 0], mask
    return out, mask
