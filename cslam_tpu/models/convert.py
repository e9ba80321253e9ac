"""Convert torch checkpoints to cslam_tpu Flax weights.

Replaces the reference's export/optimize tooling (component #13,
cslam/vpr/cosplace_utils/export_cosplace.py — torch -> ONNX -> TensorRT)
with the conversion this framework needs: torch state_dicts (torchvision
ResNet18 / CosPlace GeoLocalizationNet / NetVLAD / SuperPoint) -> Flax
variable trees, saved as flat "a/b/c"-keyed .npz files that the model
wrappers load (models/cosplace.py:_load_checkpoint).

Layout mapping: torch conv weights (O, I, H, W) -> Flax (H, W, I, O);
BatchNorm running stats land in the `batch_stats` collection.
"""

from typing import Dict

import numpy as np


def _conv(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _dense(w):
    return np.transpose(np.asarray(w), (1, 0))


def _bn(state, prefix, out, flax_path):
    out[f"params/{flax_path}/scale"] = np.asarray(state[f"{prefix}.weight"])
    out[f"params/{flax_path}/bias"] = np.asarray(state[f"{prefix}.bias"])
    out[f"batch_stats/{flax_path}/mean"] = np.asarray(
        state[f"{prefix}.running_mean"])
    out[f"batch_stats/{flax_path}/var"] = np.asarray(
        state[f"{prefix}.running_var"])


def convert_resnet18_backbone(state: Dict, out: Dict, torch_prefix: str = "",
                              flax_prefix: str = "ResNet18Backbone_0"):
    """torchvision resnet18 conv stack -> ResNet18Backbone params."""
    p = torch_prefix
    out[f"params/{flax_prefix}/Conv_0/kernel"] = _conv(state[f"{p}conv1.weight"])
    _bn(state, f"{p}bn1", out, f"{flax_prefix}/BatchNorm_0")
    block = 0
    for stage in range(1, 5):
        for b in range(2):
            tp = f"{p}layer{stage}.{b}"
            fp = f"{flax_prefix}/BasicBlock_{block}"
            out[f"params/{fp}/Conv_0/kernel"] = _conv(
                state[f"{tp}.conv1.weight"])
            _bn(state, f"{tp}.bn1", out, f"{fp}/BatchNorm_0")
            out[f"params/{fp}/Conv_1/kernel"] = _conv(
                state[f"{tp}.conv2.weight"])
            _bn(state, f"{tp}.bn2", out, f"{fp}/BatchNorm_1")
            if f"{tp}.downsample.0.weight" in state:
                out[f"params/{fp}/Conv_2/kernel"] = _conv(
                    state[f"{tp}.downsample.0.weight"])
                _bn(state, f"{tp}.downsample.1", out, f"{fp}/BatchNorm_2")
            block += 1
    return out


def convert_cosplace(state: Dict) -> Dict[str, np.ndarray]:
    """CosPlace/EigenPlaces GeoLocalizationNet state_dict -> flat npz
    dict for models.cosplace.GeoLocalizationNet.

    Expects torchvision-resnet18-style backbone keys (optionally prefixed
    'backbone.') and an aggregation with GeM p and a Linear layer
    (aggregation.1.p / aggregation.3.{weight,bias} in the reference's
    Sequential: L2Norm, GeM, Flatten, Linear, L2Norm)."""
    out: Dict[str, np.ndarray] = {}
    prefix = "backbone." if any(k.startswith("backbone.") for k in state) \
        else ""
    convert_resnet18_backbone(state, out, prefix)
    # GeM exponent
    for key in ("aggregation.1.p", "gem.p", "aggregation.gem.p"):
        if key in state:
            out["params/GeM_0/p"] = np.asarray(state[key]).reshape(1)
            break
    else:
        out["params/GeM_0/p"] = np.ones(1, np.float32) * 3.0
    # final Linear
    for wkey, bkey in (("aggregation.3.weight", "aggregation.3.bias"),
                       ("fc.weight", "fc.bias")):
        if wkey in state:
            out["params/Dense_0/kernel"] = _dense(state[wkey])
            out["params/Dense_0/bias"] = np.asarray(state[bkey])
            break
    return out


def convert_superpoint(state: Dict) -> Dict[str, np.ndarray]:
    """MagicLeap SuperPoint state_dict -> models.superpoint.SuperPointNet.

    torch layout: conv1a/1b ... conv4a/4b shared encoder, convPa/convPb
    detector head, convDa/convDb descriptor head."""
    out: Dict[str, np.ndarray] = {}
    order = ["conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
             "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb"]
    for i, name in enumerate(order):
        out[f"params/Conv_{i}/kernel"] = _conv(state[f"{name}.weight"])
        out[f"params/Conv_{i}/bias"] = np.asarray(state[f"{name}.bias"])
    return out


def convert_lightglue(state: Dict, num_layers: int = 9) -> Dict:
    """Official cvg/LightGlue state_dict -> models.lightglue.LightGlueNet.

    torch names: posenc.Wr.weight; transformers.{i}.self_attn.{Wqkv,
    out_proj,ffn.0,ffn.1,ffn.3}; transformers.{i}.cross_attn.{to_qk,to_v,
    to_out,ffn.*}; log_assignment.{i}.{final_proj,matchability}. Only the
    last assignment head is used at full depth (early-exit heads are a
    dynamic-shape GPU optimization); token_confidence is skipped.
    input_proj exists only when input_dim != descriptor_dim."""
    out: Dict[str, np.ndarray] = {}

    def dense(torch_key, flax_path, bias=True):
        out[f"params/{flax_path}/kernel"] = _dense(state[f"{torch_key}.weight"])
        if bias:
            out[f"params/{flax_path}/bias"] = np.asarray(
                state[f"{torch_key}.bias"])

    def layernorm(torch_key, flax_path):
        out[f"params/{flax_path}/scale"] = np.asarray(
            state[f"{torch_key}.weight"])
        out[f"params/{flax_path}/bias"] = np.asarray(state[f"{torch_key}.bias"])

    dense("posenc.Wr", "posenc_Wr", bias=False)
    if "input_proj.weight" in state:
        dense("input_proj", "input_proj")
    for i in range(num_layers):
        tp = f"transformers.{i}.self_attn"
        fp = f"transformers_{i}_self_attn"
        dense(f"{tp}.Wqkv", f"{fp}/Wqkv")
        dense(f"{tp}.out_proj", f"{fp}/out_proj")
        dense(f"{tp}.ffn.0", f"{fp}/ffn_0")
        layernorm(f"{tp}.ffn.1", f"{fp}/ffn_1")
        dense(f"{tp}.ffn.3", f"{fp}/ffn_3")
        tp = f"transformers.{i}.cross_attn"
        fp = f"transformers_{i}_cross_attn"
        dense(f"{tp}.to_qk", f"{fp}/to_qk")
        dense(f"{tp}.to_v", f"{fp}/to_v")
        dense(f"{tp}.to_out", f"{fp}/to_out")
        dense(f"{tp}.ffn.0", f"{fp}/ffn_0")
        layernorm(f"{tp}.ffn.1", f"{fp}/ffn_1")
        dense(f"{tp}.ffn.3", f"{fp}/ffn_3")
    last = num_layers - 1
    dense(f"log_assignment.{last}.final_proj", "log_assignment/final_proj")
    dense(f"log_assignment.{last}.matchability",
          "log_assignment/matchability")
    return out


def convert_netvlad_layer(state: Dict, prefix: str = "pool.") -> Dict:
    """NetVLAD layer (centroids + 1x1 assignment conv) ->
    models.netvlad.NetVLADLayer params."""
    out: Dict[str, np.ndarray] = {}
    out["params/NetVLADLayer_0/centroids"] = np.asarray(
        state[f"{prefix}centroids"])
    out["params/NetVLADLayer_0/assign_conv/kernel"] = _conv(
        state[f"{prefix}conv.weight"])
    return out


def save_npz(flat: Dict[str, np.ndarray], path: str):
    np.savez(path, **flat)


def convert_torch_checkpoint(torch_path: str, out_path: str,
                             model: str = "cosplace"):
    """Load a .pth/.tar torch checkpoint and write the Flax npz."""
    import torch

    blob = torch.load(torch_path, map_location="cpu", weights_only=False)
    state = blob.get("state_dict", blob.get("model_state_dict", blob)) \
        if isinstance(blob, dict) else blob
    state = {k: v.numpy() if hasattr(v, "numpy") else v
             for k, v in state.items()}
    converters = {
        "cosplace": convert_cosplace,
        "superpoint": convert_superpoint,
        "lightglue": convert_lightglue,
        "netvlad": convert_netvlad_layer,
    }
    flat = converters[model](state)
    save_npz(flat, out_path)
    return flat
