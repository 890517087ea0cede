"""Pure-numpy oracle of the reference stereo-synthesis semantics.

A direct, unoptimized port of SbsProcessor's behaviour
(reference PredictAndGenerate.py:63-198) used only to verify the TPU
implementation. Keeps every quirk: banker's rounding via python round(),
zip truncation of the last cutoff entry, 3/5 hole-fill plane, the
torchvision Gaussian kernel/reflect-pad/round chain, and the left-edge copy.
"""

from __future__ import annotations

import math

import numpy as np


class OracleSbs:
    def __init__(self, offset_fg=0.025, offset_bg=-0.01, offset_step_size=1,
                 sigma=3.0, dampening_count=2, dampening_init=0.3,
                 dampening_ratio=0.4):
        self.offset_fg = offset_fg
        self.offset_bg = offset_bg
        self.offset_step_size = offset_step_size
        self.sigma = sigma
        self.last_offset_range = None
        self.depth_list = []
        # dampening weights (reference :72-80; defaults are the reference's)
        self.count = dampening_count
        self.init_w = dampening_init
        self.ratio = dampening_ratio
        t, acc = self.init_w, 0.0
        for _ in range(self.count):
            acc += t
            t *= self.ratio
        self.orig_ratio = 1.0 - acc

    # reference get_depth (:131-145)
    def smooth_depth(self, depth):
        depth = depth.astype(np.float64)
        raw = depth.copy()
        while len(self.depth_list) < self.count:
            self.depth_list.append(depth.copy())
        t = self.init_w
        depth = depth * self.orig_ratio
        for i in range(len(self.depth_list) - 1, -1, -1):
            depth = depth + self.depth_list[i] * t
            t *= self.ratio
        del self.depth_list[0]
        self.depth_list.append(raw)
        return depth

    # reference get_cutoff (:101-126)
    def get_cutoff(self, depth):
        limit_step = math.ceil(depth.max())
        h = depth.shape[0]
        offset_range = [self.offset_bg * h * limit_step / 14,
                        self.offset_fg * h * limit_step / 14]
        if self.last_offset_range is not None:
            offset_range[0] = (self.last_offset_range[0] + offset_range[0]) / 2
            offset_range[1] = (self.last_offset_range[1] + offset_range[1]) / 2
        self.last_offset_range = offset_range
        cutoff_list = []
        for i in range(round(offset_range[0]), 0, self.offset_step_size):
            cutoff_list.append((i - offset_range[0])
                               / (0.00001 + offset_range[1] - offset_range[0])
                               * (0.00001 + limit_step))
        cutoff_list.append((0 - offset_range[0])
                           / (0.00001 + offset_range[1] - offset_range[0])
                           * (0.00001 + limit_step))
        for i in range(1, round(offset_range[1]), self.offset_step_size):
            cutoff_list.append((i - offset_range[0])
                               / (0.00001 + offset_range[1] - offset_range[0])
                               * (0.00001 + limit_step))
        cutoff_list.append(limit_step)
        cutoff_list = sorted(cutoff_list)
        cutoff_list[0] = 0
        step_list = [cutoff_list[i + 1] - cutoff_list[i]
                     for i in range(len(cutoff_list) - 1)]
        offset_x_list = []
        for thr in cutoff_list:
            offset_x_list.append(round(
                thr / (0.00001 + limit_step)
                * (0.00001 + offset_range[1] - offset_range[0])
                + offset_range[0]))
        return cutoff_list, offset_range, step_list, limit_step, offset_x_list

    @staticmethod
    def _gaussian_kernel1d(ksize, sigma):
        x = np.linspace(-(ksize - 1) * 0.5, (ksize - 1) * 0.5, ksize)
        pdf = np.exp(-0.5 * (x / sigma) ** 2)
        return pdf / pdf.sum()

    def gaussian_blur_u8(self, img_u8, kx, ky):
        """torchvision gaussian_blur semantics: reflect pad, separable conv,
        round-half-even, uint8."""
        kxw = self._gaussian_kernel1d(kx, self.sigma)
        kyw = self._gaussian_kernel1d(ky, self.sigma)
        x = img_u8.astype(np.float32)
        px, py = kx // 2, ky // 2
        x = np.pad(x, ((py, py), (px, px), (0, 0)), mode="reflect")
        # convolve W then H (order irrelevant — separable outer product)
        x = np.apply_along_axis(lambda r: np.convolve(r, kxw[::-1], "valid"),
                                1, x)
        x = np.apply_along_axis(lambda c: np.convolve(c, kyw[::-1], "valid"),
                                0, x)
        return np.clip(np.round(x), 0, 255).astype(np.uint8)

    # reference left_side_sbs (:157-198), taking an already-smoothed depth
    def left_side_sbs(self, img_u8, depth):
        h, w, _ = img_u8.shape
        result_img = np.zeros_like(img_u8)
        covered = np.zeros((h, w), bool)
        kernel_size = round(0.0036 * h)
        cutoff_list, offset_range, step_list, limit_step, offset_x_list = \
            self.get_cutoff(depth)
        offset_imgs = [np.roll(img_u8, off, axis=1) for off in offset_x_list]
        offset_x = 0
        for idx, thr, stp in zip(range(len(cutoff_list)), cutoff_list, step_list):
            mask = ((thr - 0.05 * stp) <= depth) & (depth < thr + 1.05 * stp)
            offset_x = offset_x_list[idx]
            if offset_x != 0:
                mask = np.roll(mask, offset_x, axis=1)
            result_img[mask] = offset_imgs[idx][mask]
            covered |= mask
        holes = ~covered
        result_img[holes] = offset_imgs[int(len(offset_imgs) * 3 / 5)][holes]
        blurred = self.gaussian_blur_u8(result_img, kernel_size * 2 + 3,
                                        kernel_size * 2 + 1)
        result_img[holes] = blurred[holes]
        result_img[:, 0:round(offset_x / 3 * 2), :] = \
            img_u8[:, 0:round(offset_x / 3 * 2), :]
        return np.concatenate([result_img, img_u8], axis=1)

    def process(self, img_u8, raw_depth):
        """Full per-frame step: smoothing + warp."""
        return self.left_side_sbs(img_u8, self.smooth_depth(raw_depth))
