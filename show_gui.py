#!/usr/bin/env python
"""Interactive orbit-camera viewer (reference show_gui.py).

Renders the trained field with the test-time renderer at interactive
thresholds (T_threshold=1e-2, capped samples, reference show_gui.py:82-88).
The dearpygui window requires the `dearpygui` package + a display; without
them, `--screenshot` mode renders a single frame to a PNG so the render-cam
path stays exercisable headless.
"""
from __future__ import annotations

import argparse
import time

import numpy as np

from ngp_pl_tpu.config import NGPConfig, RenderConfig, TrainConfig, add_train_args, config_from_args
from ngp_pl_tpu.datasets import dataset_dict
from ngp_pl_tpu.datasets.ray_utils import get_ray_directions
from ngp_pl_tpu.models.ngp import NGP
from ngp_pl_tpu.models.rendering import make_device_round_renderer
from ngp_pl_tpu.training.checkpoint import load_slim_checkpoint


class OrbitCamera:
    """Orbit/zoom/pan camera (reference show_gui.py:19-51)."""

    def __init__(self, K, img_wh, r):
        self.K = K
        self.W, self.H = img_wh
        self.radius = r
        self.center = np.zeros(3, np.float32)
        self.rot = np.eye(3, dtype=np.float32)

    @property
    def pose(self):
        res = np.eye(4, dtype=np.float32)
        res[2, 3] -= self.radius
        rot = np.eye(4, dtype=np.float32)
        rot[:3, :3] = self.rot
        res = rot @ res
        res[:3, 3] -= self.center
        return res[:3]

    def _rotvec_to_R(self, axis, angle):
        axis = axis / (np.linalg.norm(axis) + 1e-12)
        K = np.array([[0, -axis[2], axis[1]],
                      [axis[2], 0, -axis[0]],
                      [-axis[1], axis[0], 0]], np.float32)
        return (np.eye(3, dtype=np.float32) + np.sin(angle) * K
                + (1 - np.cos(angle)) * K @ K)

    def orbit(self, dx, dy):
        self.rot = (self._rotvec_to_R(self.rot[:, 1], -0.005 * dx)
                    @ self._rotvec_to_R(self.rot[:, 0], -0.005 * dy)
                    @ self.rot)

    def scale(self, delta):
        self.radius *= 1.1 ** (-delta)

    def pan(self, dx, dy, dz=0.0):
        self.center += 1e-4 * self.rot @ np.array([dx, dy, dz], np.float32)


class NGPGUI:
    def __init__(self, tcfg: TrainConfig, K, img_wh, radius=2.5):
        self.tcfg = tcfg
        cfg = tcfg.ngp_config()
        self.ngp = NGP(cfg)
        params = self.ngp.init(__import__("jax").random.PRNGKey(0))
        assert tcfg.ckpt_path, "--ckpt_path is required for the GUI"
        self.params, occ = load_slim_checkpoint(tcfg.ckpt_path, params=params)
        import jax.numpy as jnp

        self.occ_grid = jnp.asarray(occ)
        # interactive thresholds (reference show_gui.py:82-88) on the
        # device-resident adaptive renderer — the same alive-ray bucketed
        # loop eval.py/bench_fps.py measure (one dispatch per chunk; the
        # chunked full-march renderer costs ~pool_mult x more field evals)
        rcfg = RenderConfig(max_samples=128, test_t_threshold=1e-2)
        from ngp_pl_tpu.ops.ray_march import (
            segment_march_dmax_ok,
            window_march_mc_ok,
        )

        dirs = get_ray_directions(img_wh[1], img_wh[0], K)
        window_ok = (
            cfg.cascades == 1 and cfg.exp_step_factor == 0.0
            and segment_march_dmax_ok(
                dirs, grid_size=cfg.grid_size,
                max_samples=rcfg.max_samples, scale=cfg.scale)
        ) or window_march_mc_ok(dirs, cfg.exp_step_factor, cfg.cascades)
        chunk = min(131072, 1 << (img_wh[0] * img_wh[1] - 1).bit_length())
        self.render_image = make_device_round_renderer(
            self.ngp, rcfg, use_window=window_ok, chunk=chunk)
        self.cam = OrbitCamera(K, img_wh, r=radius)
        self.W, self.H = img_wh

    def render_cam(self, cam: OrbitCamera) -> np.ndarray:
        t = time.time()
        key = (cam.H, cam.W, cam.K.tobytes())
        if getattr(self, "_dirs_key", None) != key:
            # camera intrinsics change only on resize — keep directions
            # stable so the renderer's device-side cache hits every frame
            self._dirs_key = key
            self._dirs = get_ray_directions(cam.H, cam.W, cam.K)
        out = self.render_image.from_pose(
            self.params, self.occ_grid, self._dirs, cam.pose)
        rgb = out["rgb"].reshape(cam.H, cam.W, 3)
        self.dt = time.time() - t
        self.mean_samples = out["total_samples"] / (cam.H * cam.W)
        return rgb

    def run_gui(self):
        import dearpygui.dearpygui as dpg

        dpg.create_context()
        rgb = np.ones((self.H, self.W, 3), np.float32)

        with dpg.texture_registry(show=False):
            dpg.add_raw_texture(
                self.W, self.H, rgb, format=dpg.mvFormat_Float_rgb,
                tag="_texture")
        with dpg.window(tag="_render_window", width=self.W, height=self.H):
            dpg.add_image("_texture")
        with dpg.window(label="Control", width=200, height=80):
            dpg.add_text("", tag="_log_time")

        def cb_drag(sender, app_data):
            self.cam.orbit(app_data[1], app_data[2])

        def cb_wheel(sender, app_data):
            self.cam.scale(app_data)

        def cb_pan(sender, app_data):
            self.cam.pan(app_data[1], app_data[2])

        with dpg.handler_registry():
            dpg.add_mouse_drag_handler(button=dpg.mvMouseButton_Left,
                                       callback=cb_drag)
            dpg.add_mouse_wheel_handler(callback=cb_wheel)
            dpg.add_mouse_drag_handler(button=dpg.mvMouseButton_Middle,
                                       callback=cb_pan)

        dpg.create_viewport(title="ngp_pl_tpu", width=self.W, height=self.H,
                            resizable=False)
        dpg.setup_dearpygui()
        dpg.show_viewport()
        while dpg.is_dearpygui_running():
            dpg.set_value("_texture", self.render_cam(self.cam))
            dpg.set_value(
                "_log_time",
                f"Render time: {1000 * self.dt:.2f} ms  "
                f"samples/ray: {self.mean_samples:.1f}")
            dpg.render_dearpygui_frame()
        dpg.destroy_context()


def main():
    parser = argparse.ArgumentParser()
    add_train_args(parser)
    parser.add_argument("--screenshot", type=str, default=None,
                        help="render one frame to PNG instead of opening a window")
    args = parser.parse_args()
    tcfg = config_from_args(args)

    dataset = dataset_dict[tcfg.dataset_name](
        root_dir=tcfg.root_dir, downsample=tcfg.downsample, read_meta=False)
    gui = NGPGUI(tcfg, dataset.K, dataset.img_wh)

    if args.screenshot:
        rgb = gui.render_cam(gui.cam)
        import imageio.v2 as imageio

        imageio.imwrite(args.screenshot,
                        (np.clip(rgb, 0, 1) * 255).astype(np.uint8))
        print(f"wrote {args.screenshot} "
              f"({1000 * gui.dt:.1f} ms, {gui.mean_samples:.1f} samples/ray)")
    else:
        gui.run_gui()


if __name__ == "__main__":
    main()
