"""Semantic segmentation bridge with the reference's mask-cache protocol.

Plays the role of DynaSLAM::SegmentDynObject (reference include/MaskNet.h,
src/MaskNet.cc): produce a per-frame dynamic-object mask from a semantic
instance segmenter, with a disk cache so precomputed masks bypass inference
entirely (MaskNet.cc:58-114: if `<dir>/<name>.png` exists it is read instead
of running the net; new masks are written back unless the dir is the
`no_save` sentinel, rgbd_tum.cc:99-109).

The embedded-CPython bridge + NDArrayConverter (MaskNet.cc:30-49,
Conversion.cc) is unnecessary here: the segmenter is an in-process JAX
callable (the Flax Mask R-CNN in models/maskrcnn, or any
`fn(rgb) -> [H, W] float` with 1 = dynamic), so frames never cross a
language boundary.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

NO_SAVE = "no_save"   # sentinel: use cache dir read-only (rgbd_tum.cc:99-109)


class SegmentDynObject:
    """mask = 1 where a *dynamic-class* object is present (the raw network
    convention; callers convert to static masks as `1 - mask`,
    rgbd_tum.cc:137-150)."""

    def __init__(self, segmenter: Optional[Callable] = None,
                 cache_dir: Optional[str] = None):
        self.segmenter = segmenter
        self.cache_dir = None
        self.read_only = False
        if cache_dir and cache_dir != NO_SAVE:
            self.cache_dir = cache_dir
            os.makedirs(cache_dir, exist_ok=True)
        elif cache_dir == NO_SAVE:
            self.read_only = True
        if segmenter is not None:
            # warm-up on a zero image, mirroring MaskNet.cc:45-48
            hw = getattr(segmenter, "image_hw", (480, 640))
            segmenter(np.zeros(hw + (3,), np.float32))

    def _cache_path(self, name: str) -> Optional[str]:
        if self.cache_dir is None:
            return None
        return os.path.join(self.cache_dir, name + ".png")

    def get_segmentation(self, rgb: np.ndarray, name: str = "",
                         cache_dir: Optional[str] = None) -> np.ndarray:
        """GetSegmentation (MaskNet.cc:58-83): cache hit -> read; else run
        the segmenter and (optionally) write back."""
        path = None
        if cache_dir:
            path = os.path.join(cache_dir, name + ".png")
        elif name:
            path = self._cache_path(name)
        if path and os.path.exists(path):
            from PIL import Image
            m = np.asarray(Image.open(path), np.float32)
            return (m > 127).astype(np.float32) if m.max() > 1 else m
        if self.segmenter is None:
            # The reference ALWAYS has a net to fall back on
            # (MaskNet.cc:86-93); this bridge may legitimately run
            # cache-only, but a miss then silently means "no dynamics",
            # which must be loud, not silent.
            if not getattr(self, "_warned_miss", False):
                import warnings
                warnings.warn(
                    "SegmentDynObject: mask-cache miss with no live "
                    "segmenter — returning an all-static mask. Precompute "
                    "masks into the cache dir or construct with a "
                    "segmenter (e.g. models.maskrcnn.build_segmenter).")
                self._warned_miss = True
            return np.zeros(rgb.shape[:2], np.float32)
        mask = np.asarray(self.segmenter(rgb), np.float32)
        if path and not self.read_only:
            from PIL import Image
            Image.fromarray((mask * 255).astype(np.uint8)).save(path)
        return mask

    def get_segmentation_label(self, rgb: np.ndarray, name: str = ""):
        """GetSegmentation_label (MaskNet.cc:85-114): mask + per-instance
        label image."""
        mask = self.get_segmentation(rgb, name)
        if self.segmenter is not None and hasattr(self.segmenter, "instances"):
            labels = np.asarray(self.segmenter.instances(rgb), np.int32)
        else:
            # connected components of the binary mask as instance labels
            # (scipy ships with jax; no OpenCV dependency)
            from scipy import ndimage
            labels, _ = ndimage.label(mask > 0.5)
            labels = labels.astype(np.int32)
        return mask, labels
