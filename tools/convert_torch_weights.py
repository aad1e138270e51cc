"""One-time converter: torchvision .pth state_dicts -> flax msgpack.

The reference downloads pretrained torchvision weights at runtime
(cnn_encoder.py:23-31 Inception-v3; cnn_embedder.py:17 resnet18). This
environment has no network egress, so the converter takes a local .pth file
(torch.load-able state_dict) and emits the matching flax variables for
attngan_tpu.models.cnn_encoder.InceptionV3Trunk / resnet.ResNet18.

Usage:
    python tools/convert_torch_weights.py inception path/to/inception_v3.pth out.msgpack
    python tools/convert_torch_weights.py resnet18 path/to/resnet18.pth out.msgpack
    python tools/convert_torch_weights.py vgg19_bn path/to/vgg19_bn.pth out.msgpack

Numeric parity of every converted block vs torch is oracle-tested in
tests/test_torch_oracle_trunks.py (random weights round-tripped through this
converter; torchvision itself isn't installed here, so the oracles are
torch re-implementations with torchvision's exact state_dict key set).

Load back with ``attngan_tpu.train.checkpoint.load_converted(path)`` and
merge into a model's variables. Without pretrained files the framework
random-initializes the trunks (documented divergence; FID parity requires
the converted weights).
"""

from __future__ import annotations

import sys

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch (O, I, kH, kW) -> flax (kH, kW, I, O)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _set(tree: dict, path: tuple, value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def convert_cnn_trunk_like(state_dict: dict) -> dict:
    """Generic converter for conv/bn/linear graphs whose flax module names
    equal the torch key prefixes (how cnn_encoder.py / resnet.py are named).

    torch 'A.B.weight' conv  -> params[A][B]['kernel'] (transposed)
    torch 'A.bn.weight/bias' -> params[A]['bn']['scale'/'bias']
    torch running_mean/var   -> batch_stats[...]['mean'/'var']
    resnet 'downsample.0/1'  -> 'downsample_conv'/'downsample_bn'
    numeric Sequential index -> merged into parent: 'layerN.M' -> 'layerN_M',
                                vgg 'features.14' -> 'features_14'
    """
    params: dict = {}
    batch_stats: dict = {}
    for key, tensor in state_dict.items():
        arr = tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else np.asarray(tensor)
        parts = key.split(".")
        leaf = parts[-1]
        scope = parts[:-1]
        # torch Sequential indices -> flax module-name fixups
        fixed = []
        i = 0
        while i < len(scope):
            s = scope[i]
            if s == "downsample" and i + 1 < len(scope) and scope[i + 1] in ("0", "1"):
                fixed.append("downsample_conv" if scope[i + 1] == "0" else "downsample_bn")
                i += 2
                continue
            if i + 1 < len(scope) and scope[i + 1].isdigit():
                fixed.append(f"{s}_{scope[i + 1]}")
                i += 2
                continue
            fixed.append(s)
            i += 1
        scope = tuple(fixed)

        if leaf == "weight":
            if arr.ndim == 4:
                _set(params, scope + ("kernel",), _conv_kernel(arr))
            elif arr.ndim == 2:  # linear: torch (out, in) -> flax (in, out)
                _set(params, scope + ("kernel",), np.ascontiguousarray(arr.T))
            else:  # batchnorm scale
                _set(params, scope + ("scale",), arr)
        elif leaf == "bias":
            _set(params, scope + ("bias",), arr)
        elif leaf == "running_mean":
            _set(batch_stats, scope + ("mean",), arr)
        elif leaf == "running_var":
            _set(batch_stats, scope + ("var",), arr)
        # num_batches_tracked, fc.* (dropped for the headless resnet) ignored
    return {"params": params, "batch_stats": batch_stats}


def convert_inception(state_dict: dict) -> dict:
    sd = {k: v for k, v in state_dict.items()
          if not k.startswith(("AuxLogits", "fc"))}
    return convert_cnn_trunk_like(sd)


def convert_resnet18(state_dict: dict) -> dict:
    sd = {k: v for k, v in state_dict.items() if not k.startswith("fc")}
    return convert_cnn_trunk_like(sd)


def convert_vgg19_bn(state_dict: dict) -> dict:
    """Keep only the ``features`` trunk (the classifier head is unused by the
    DFCVAE's tap walk, reference VAE.py:143-162)."""
    sd = {k: v for k, v in state_dict.items() if k.startswith("features")}
    return convert_cnn_trunk_like(sd)


def main(argv):
    import torch
    from flax import serialization

    kind, src, dst = argv[1], argv[2], argv[3]
    state_dict = torch.load(src, map_location="cpu", weights_only=True)
    variables = {"inception": convert_inception, "resnet18": convert_resnet18,
                 "vgg19_bn": convert_vgg19_bn}[kind](state_dict)
    with open(dst, "wb") as f:
        f.write(serialization.msgpack_serialize(variables))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main(sys.argv)
