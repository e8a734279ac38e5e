"""Interactive progressive viewer — the reference app-layer analog.

The reference wraps the tracer in a winit/egui GUI with a fly camera,
live settings, and progressive display (reference: src/app.rs). The TPU
framework is headless-first, but this module provides the same
interactive loop on top of matplotlib when a display is available:

- progressive accumulation republished every sync_rate samples,
- WASD + QE fly camera (shift = 10x, ctrl = 0.1x speed), arrow-key look
  (reference: src/app.rs:439-492),
- sun controls j/l (azimuth), i/k (elevation), =/- (intensity) — the
  reference's environment GUI (src/app.rs:365-437),
- keys for NEE mode (n), tonemap cycling (t), denoise (x), save (p),
- camera moves mark the state dirty and restart accumulation, exactly
  like the reference's interacting/dirty flags (src/trace.rs:216-222).

Run: python -m rustic_tpu.cli render <scene.glb> --interactive
"""

from __future__ import annotations

import math
import time
from typing import Optional

import numpy as np

from rustic_tpu.config import (
    NextEventEstimation,
    RenderSettings,
    Tonemapping,
    TracingConfig,
)
from rustic_tpu.ops.tonemap import apply_tonemap
from rustic_tpu.runtime.state import TracingState

_MOVE_SPEED = 0.3  # reference: src/app.rs speed with shift/ctrl modifiers
_TURN_SPEED = 0.05


class Viewer:
    def __init__(
        self,
        scene,
        config: TracingConfig,
        settings: Optional[RenderSettings] = None,
    ):
        self.scene = scene
        self.settings = settings or RenderSettings(sync_rate=4)
        self.state = TracingState(
            config.width, config.height, config, self.settings
        )
        self.tonemap = self.settings.tonemap
        self._running = True

    # -- camera (reference: src/app.rs:439-492) -----------------------------

    def _move(self, forward=0.0, right=0.0, up=0.0, speed_scale=1.0):
        cfg = self.state.config
        pitch, yaw = cfg.cam_rotation
        # camera looks along Ry(yaw)Rx(pitch) @ +z
        fwd = (
            math.sin(yaw) * math.cos(pitch),
            -math.sin(pitch),
            math.cos(yaw) * math.cos(pitch),
        )
        rgt = (math.cos(yaw), 0.0, -math.sin(yaw))
        step = _MOVE_SPEED * speed_scale
        pos = tuple(
            p + step * (forward * f + right * r)
            for p, f, r in zip(cfg.cam_position, fwd, rgt)
        )
        pos = (pos[0], pos[1] + step * up, pos[2])
        self.state.set_config(cam_position=pos)

    def _orbit_sun(self, dazimuth=0.0, delevation=0.0, dintensity=0.0):
        """Sun controls (reference: src/app.rs:365-437 — the environment
        GUI's intensity slider + draggable sun-position disc)."""
        x, y, z, intensity = self.state.config.sun_direction
        r = max(math.sqrt(x * x + y * y + z * z), 1e-6)
        azimuth = math.atan2(z, x) + dazimuth
        elevation = math.asin(max(-1.0, min(1.0, y / r))) + delevation
        elevation = max(-1.55, min(1.55, elevation))
        intensity = max(0.0, intensity * (1.0 + dintensity))
        self.state.set_config(
            sun_direction=(
                math.cos(elevation) * math.cos(azimuth),
                math.sin(elevation),
                math.cos(elevation) * math.sin(azimuth),
                intensity,
            )
        )

    def _turn(self, dpitch=0.0, dyaw=0.0):
        cfg = self.state.config
        self.state.set_config(
            cam_rotation=(
                cfg.cam_rotation[0] + dpitch * _TURN_SPEED,
                cfg.cam_rotation[1] + dyaw * _TURN_SPEED,
            )
        )

    def handle_key(self, key: str) -> bool:
        """Apply one key action; returns False when the viewer should quit.

        shift+<move> = 10x speed, ctrl+<move> = 0.1x (reference:
        src/app.rs:439-492's shift/ctrl fly-camera modifiers)."""
        speed = 1.0
        while "+" in key and key.split("+", 1)[0] in ("shift", "ctrl"):
            mod, key = key.split("+", 1)
            speed *= 10.0 if mod == "shift" else 0.1
        if len(key) == 1 and key.isalpha() and key.isupper():
            # matplotlib delivers shift+letter as the bare uppercase
            # letter, not "shift+x"
            speed *= 10.0
            key = key.lower()
        actions = {
            "w": lambda: self._move(forward=1, speed_scale=speed),
            "s": lambda: self._move(forward=-1, speed_scale=speed),
            "a": lambda: self._move(right=-1, speed_scale=speed),
            "d": lambda: self._move(right=1, speed_scale=speed),
            "q": lambda: self._move(up=-1, speed_scale=speed),
            "e": lambda: self._move(up=1, speed_scale=speed),
            "up": lambda: self._turn(dpitch=-1),
            "down": lambda: self._turn(dpitch=1),
            "left": lambda: self._turn(dyaw=-1),
            "right": lambda: self._turn(dyaw=1),
            "j": lambda: self._orbit_sun(dazimuth=-0.1),
            "l": lambda: self._orbit_sun(dazimuth=0.1),
            "i": lambda: self._orbit_sun(delevation=0.1),
            "k": lambda: self._orbit_sun(delevation=-0.1),
            "=": lambda: self._orbit_sun(dintensity=0.25),
            "-": lambda: self._orbit_sun(dintensity=-0.2),
        }
        if key in actions:
            actions[key]()
            return True
        if key == "n":  # cycle NEE mode
            cfg = self.state.config
            self.state.set_config(
                nee=NextEventEstimation((int(cfg.nee) + 1) % 3)
            )
        elif key == "t":  # cycle tonemap operator
            self.tonemap = Tonemapping(
                (int(self.tonemap) + 1) % len(Tonemapping)
            )
        elif key == "x":  # toggle denoise
            self.settings.denoise = not self.settings.denoise
        elif key == "p":  # save PNG
            from rustic_tpu.utils.image_io import save_png

            save_png("viewer_capture.png", self.state.framebuffer, self.tonemap)
        elif key == "escape":
            self._running = False
            return False
        return True

    def display_frame(self) -> np.ndarray:
        import jax.numpy as jnp

        return np.asarray(
            apply_tonemap(jnp.asarray(self.state.framebuffer), self.tonemap)
        )

    def step(self) -> np.ndarray:
        self.state.step(self.scene)
        return self.display_frame()

    # -- matplotlib event loop ----------------------------------------------

    def run(self):
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 6))
        fig.canvas.manager.set_window_title("rustic_tpu")
        im = ax.imshow(self.display_frame())
        ax.axis("off")
        status = ax.set_title("starting…")

        def on_key(event):
            if not self.handle_key(event.key or ""):
                plt.close(fig)

        fig.canvas.mpl_connect("key_press_event", on_key)
        plt.ion()
        plt.show()
        t0 = time.time()
        while self._running and plt.fignum_exists(fig.number):
            frame = self.step()
            im.set_data(frame)
            status.set_text(
                f"{self.state.samples} spp | "
                f"{self.state.samples / max(time.time() - t0, 1e-9):.1f} spp/s | "
                f"nee={self.state.config.nee.name} "
                f"tonemap={Tonemapping(self.tonemap).name}"
            )
            fig.canvas.draw_idle()
            fig.canvas.flush_events()
        plt.ioff()
