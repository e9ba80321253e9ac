"""Global-descriptor extraction component.

Capability parity with the reference's C++ GlobalDescriptorComponent
(/root/reference/src/front_end/global_descriptor_component.cpp): consumes
KeyframeRGB from the sensor handler, computes the global descriptor
(EigenPlaces/CosPlace CNN — here the Flax model), publishes
cslam/processed_global_descriptor for the loop-closure detector
(:63-78). TPU-native difference: keyframes are batched — pending images
accumulate and one XLA program embeds the whole batch per tick, instead
of the reference's per-frame ONNX/TensorRT inference.
"""

from typing import Dict, List, Optional

import numpy as np

from cslam_tpu.comm import messages as msgs


class GlobalDescriptorComponent:

    def __init__(self, params: Dict, bus, model=None,
                 batch_size: int = 8):
        self.params = params
        self.bus = bus
        self.batch_size = batch_size
        if model is not None:
            self.model = model
        else:
            technique = params.get("frontend.global_descriptor_technique",
                                   "cosplace").lower()
            if technique == "netvlad":
                from cslam_tpu.models.netvlad import NetVLAD
                self.model = NetVLAD(params)
            else:
                from cslam_tpu.models.cosplace import CosPlace
                self.model = CosPlace(params)
        self.pending: List[msgs.KeyframeRGB] = []
        self.publisher = bus.create_publisher(
            "cslam/processed_global_descriptor")
        bus.subscribe("cslam/keyframe_data", self.receive_keyframe)

    def receive_keyframe(self, msg):
        if isinstance(msg, msgs.KeyframeRGB):
            self.pending.append(msg)
            if len(self.pending) >= self.batch_size:
                self.flush()

    def flush(self):
        """Embed all pending keyframes in one batched forward."""
        if not self.pending:
            return 0
        batch = self.pending
        self.pending = []
        if hasattr(self.model, "compute_embeddings_batch"):
            images = np.stack([
                np.broadcast_to(m.image, m.image.shape[:2] + (3,))
                if m.image.shape[2] == 1 else m.image for m in batch
            ])
            embeddings = self.model.compute_embeddings_batch(images)
        else:
            embeddings = [
                self.model.compute_embedding(m.image) for m in batch
            ]
        for m, emb in zip(batch, embeddings):
            self.publisher.publish(
                msgs.GlobalDescriptor(
                    keyframe_id=m.id,
                    robot_id=self.params["robot_id"],
                    descriptor=np.asarray(emb, dtype=np.float32)))
        return len(batch)

    def tick(self):
        """Periodic flush (maps to the reference's per-message callback
        cadence without requiring a full batch)."""
        return self.flush()
