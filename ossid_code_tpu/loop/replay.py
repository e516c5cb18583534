"""Device-resident finetune replay buffer.

The online loop's finetune pass (ref scripts/online_learning.py:650-679) re-reads
every buffered frame from disk and ships it to the device as a full-resolution
float32 batch — ~43 MB per batch of 8 over a bandwidth-capped host<->device
link, which makes self-supervised finetuning the dominant per-frame cost.

TPU-native fix: the frame is ALREADY on device when the finetune gate opens —
detection uploaded it as uint8 RGB (`_build_det_batch`). This buffer keeps that
device array alive, pairs it with the pseudo-label mask shipped as packed bits
(H*W/8 bytes ≈ 38 KB at 480x640), and the finetune pass trains straight from
HBM via `DtoidModel.train_step_u8_async` — per-event wire traffic drops from
~43 MB/batch to ~1 MB/batch (templates + heatmaps only).

Semantics: with plain uint8 frame transport the replay feed is bit-identical to
the host path's `process_data` output (u8/255 at native resolution), so losses
and weight updates match exactly (tested). With `--yuv_transfer` the replay
trains on the YUV-4:2:0-decoded frame — i.e. exactly what detection saw on the
wire — rather than the pristine PNG decode.
"""

from __future__ import annotations

import numpy as np


class DeviceReplayBuffer:
    """Maps (obj_id, scene_id, im_id) -> (frame_dev, mask_bits_dev).

    frame_dev: (1, H, W, 3) uint8, committed to the device (the detection-time
    upload). mask_bits_dev: (1, H*W//8) uint8, little-endian bit-packed
    pseudo-label mask (unpacked in-graph by `train_step_u8`).
    """

    def __init__(self, max_frames: int = 1024):
        self.max_frames = int(max_frames)
        self.entries: dict = {}

    def __len__(self):
        return len(self.entries)

    def add(self, key, frame_dev, mask: np.ndarray) -> bool:
        """Insert/refresh one gated frame. `mask` is the (H, W) bool/float
        pseudo-label at frame resolution. Returns False (and stores nothing)
        when the buffer is full and the key is new — the caller's finetune
        then falls back to the host path for the whole event."""
        import jax

        if frame_dev is None:
            return False
        key = tuple(int(k) for k in key)
        if key not in self.entries and len(self.entries) >= self.max_frames:
            return False
        m = np.asarray(mask)
        bits = np.packbits((m.reshape(-1) > 0), bitorder="little")[None]
        self.entries[key] = (frame_dev, jax.device_put(bits))
        return True

    def covers(self, targets) -> bool:
        """True iff every target dict has a replay entry."""
        return all(
            (int(t["obj_id"]), int(t["scene_id"]), int(t["im_id"])) in self.entries
            for t in targets
        )

    def frame(self, key):
        return self.entries[tuple(int(k) for k in key)][0]

    def bits(self, key):
        return self.entries[tuple(int(k) for k in key)][1]

    def clear(self):
        self.entries.clear()
