"""Full VGGT model: aggregator + camera/depth/point/track heads.

Parity target: vggt/models/vggt.py:17-96. Heads run in fp32 even when the
aggregator computes in bf16 (the reference's autocast(enabled=False) block,
vggt.py:66; finetune_timm_vggt.py:359-372).
"""
from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gd3d.models.vggt.aggregator import Aggregator
from gd3d.models.vggt.config import VggtConfig
from gd3d.models.vggt.heads import CameraHead, VggtDPTHead
from gd3d.models.vggt.track import TrackHead


class Vggt(nn.Module):
    cfg: VggtConfig
    # optional sequence parallelism for the aggregator's global attention
    sp_mesh: Optional[object] = None
    sp_axis: str = "data"
    sp_batch_axis: Optional[str] = None

    def setup(self):
        cfg = self.cfg
        self.aggregator = Aggregator(
            cfg, sp_mesh=self.sp_mesh, sp_axis=self.sp_axis,
            sp_batch_axis=self.sp_batch_axis, name="aggregator",
        )
        self.camera_head = CameraHead(cfg, name="camera_head")
        self.depth_head = VggtDPTHead(
            cfg, output_dim=2, activation="exp", conf_activation="expp1",
            name="depth_head",
        )
        self.point_head = VggtDPTHead(
            cfg, output_dim=4, activation="inv_log", conf_activation="expp1",
            name="point_head",
        )
        self.track_head = TrackHead(cfg, name="track_head")

    def __call__(
        self,
        images: jnp.ndarray,
        temperature=1.0,
        query_points: Optional[jnp.ndarray] = None,
        run_track: bool = False,
        return_track_tokens: bool = False,
    ) -> Dict:
        """images (B, S, H, W, 3) in [0, 1]."""
        B, S, H, W, _ = images.shape
        tokens_list, attn = self.aggregator(images, temperature=temperature)
        tokens_f32 = [t.astype(jnp.float32) for t in tokens_list]

        out: Dict = {"attn": attn}
        out["pose_enc"] = self.camera_head(
            tokens_f32[-1], num_iterations=self.cfg.camera_iterations
        )
        depth, depth_conf = self.depth_head(tokens_f32, (H, W))
        out["depth"] = depth          # (B, S, H, W, 1)
        out["depth_conf"] = depth_conf
        pts, pts_conf = self.point_head(tokens_f32, (H, W))
        out["world_points"] = pts
        out["world_points_conf"] = pts_conf
        if run_track and query_points is not None:
            coords, vis, conf = self.track_head(
                tokens_f32, (H, W), query_points
            )
            out["track"] = coords[-1]
            out["vis"] = vis
            out["track_conf"] = conf
        if return_track_tokens:
            # the track head only reads tokens_list[0] (for shapes) and the
            # dpt_hooks layers; exporting just those lets callers run
            # track() later WITHOUT re-running the 1B aggregator — matching
            # the reference, which tracks from saved aggregated_tokens_list
            # (finetune_timm_vggt.py:438)
            keep = {0, *self.cfg.dpt_hooks}
            out["track_tokens"] = [
                tokens_f32[i] if i in keep else None
                for i in range(len(tokens_f32))
            ]
        return out

    def track(self, track_tokens, image_hw, query_points, iters=None):
        """Run ONLY the track head on precomputed aggregator tokens (the
        list returned under 'track_tokens'). Returns (B, S, N, 2) coords."""
        coords, vis, conf = self.track_head(
            track_tokens, tuple(image_hw), query_points, iters=iters
        )
        return coords[-1]
