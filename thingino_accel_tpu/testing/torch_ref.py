"""Independent cross-framework oracle: run an IR graph in PyTorch.

The reference verifies its extractions by rebuilding models in PyTorch
(``/root/reference/mgk-decompiler/scripts/mgk_to_pytorch.py``) and
comparing outputs. This is the same role for the TPU framework: execute
the f32 path of an ``ir.Graph`` with torch (CPU) ops — a runtime that
shares no code with the JAX executor — and compare against
``Engine.run_np``. Divergence localizes bugs to op semantics rather
than to XLA/compilation.

f32 graphs only (torch is the independent float oracle; integer
bit-parity is the C-semantics emulator ``testing/refemu.py``'s job).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from thingino_accel_tpu.ir.graph import Graph
from thingino_accel_tpu.ops.reference import _conv_pads


def run_torch(graph: Graph, feeds: Dict[str, np.ndarray]
              ) -> Dict[str, np.ndarray]:
    """Execute ``graph`` (f32) with torch ops; NHWC in/out like Engine."""
    import torch
    import torch.nn.functional as F

    env: Dict[str, torch.Tensor] = {}
    for name, arr in feeds.items():
        env[name] = torch.from_numpy(
            np.asarray(arr, np.float32))                    # NHWC
    for name, t in graph.tensors.items():
        if t.is_const:
            env[name] = torch.from_numpy(
                np.asarray(t.data, np.float32))

    def nchw(x):
        return x.permute(0, 3, 1, 2) if x.dim() == 4 else x

    def nhwc(x):
        return x.permute(0, 2, 3, 1) if x.dim() == 4 else x

    for node in graph.nodes:
        op, a = node.op, node.attrs
        out_name = node.outputs[0]
        out_t = graph.tensors[out_name]

        if op in ("CONV2D", "DEPTHWISE_CONV2D"):
            x = env[node.inputs[0]]
            w = env[node.inputs[1]]                          # OIHW
            b = env.get(node.inputs[2]) if len(node.inputs) > 2 else None
            groups = a.get("groups", 1)
            cin = x.shape[3]
            if op == "DEPTHWISE_CONV2D" or (groups > 1 and groups == cin):
                groups = cin
            out_hw = (out_t.shape[1], out_t.shape[2])
            (pt, pb), (pl, pr) = _conv_pads(
                (x.shape[1], x.shape[2]), out_hw, a["kernel"],
                a["stride"], a["dilation"], a["padding"],
                a["explicit_pad"])
            xin = F.pad(nchw(x), (pl, pr, pt, pb))
            y = F.conv2d(xin, w, b, stride=tuple(a["stride"]),
                         dilation=tuple(a["dilation"]), groups=groups)
            y = nhwc(y)
            act = a.get("activation", "NONE")
            if act == "RELU":
                y = torch.relu(y)
            elif act == "SILU":
                y = y * torch.sigmoid(y)
            elif act == "LEAKY_RELU":
                y = F.leaky_relu(y, a.get("alpha", 0.01) or 0.01)
            env[out_name] = y

        elif op == "FC":
            x = env[node.inputs[0]]
            w = env[node.inputs[1]]                          # (O, I)
            b = env.get(node.inputs[2]) if len(node.inputs) > 2 else None
            env[out_name] = F.linear(x.reshape(x.shape[0], -1), w, b)

        elif op == "RELU":
            env[out_name] = torch.relu(env[node.inputs[0]])
        elif op == "RELU6":
            env[out_name] = torch.clamp(env[node.inputs[0]], 0.0, 6.0)
        elif op == "LEAKY_RELU":
            env[out_name] = F.leaky_relu(
                env[node.inputs[0]], a.get("alpha", 0.0) or 0.01)
        elif op == "SIGMOID":
            env[out_name] = torch.sigmoid(env[node.inputs[0]])
        elif op == "SILU":
            x = env[node.inputs[0]]
            env[out_name] = x * torch.sigmoid(x)
        elif op == "CLIP":
            env[out_name] = torch.clamp(
                env[node.inputs[0]], a.get("min", 0.0), a.get("max", 6.0))

        elif op == "SOFTMAX":
            env[out_name] = torch.softmax(
                env[node.inputs[0]], dim=int(a.get("axis", -1)))

        elif op == "CONCAT":
            xs = [env[i] for i in node.inputs]
            axis = int(a.get("axis", 3))
            # same axis inference as the executor: .mars declares NCHW
            # axis 1 (== NHWC 3) and some files carry garbage values
            rank = xs[0].dim()
            cands = []
            for ax in range(rank):
                tot = sum(x.shape[ax] for x in xs)
                others = all(
                    all(x.shape[d] == xs[0].shape[d] for x in xs)
                    for d in range(rank) if d != ax)
                if others and len(out_t.shape) == rank \
                        and out_t.shape[ax] in (tot, 0) and tot > 0:
                    cands.append(ax)
            if len(cands) == 1:
                axis = cands[0]
            elif axis == 1 and rank == 4:
                axis = 3
            env[out_name] = torch.cat(xs, dim=axis)

        elif op == "ADD":
            env[out_name] = env[node.inputs[0]] + env[node.inputs[1]]
        elif op == "MUL":
            env[out_name] = env[node.inputs[0]] * env[node.inputs[1]]

        elif op == "MAXPOOL":
            x = env[node.inputs[0]]
            kh, kw = a.get("kernel", (1, 1))
            sh, sw = a.get("stride", (1, 1))
            ep = a.get("explicit_pad", (0, 0, 0, 0))
            if a.get("padding") == "EXPLICIT":
                (pt, pb), (pl, pr) = (ep[0], ep[1]), (ep[2], ep[3])
            elif a.get("padding") == "SAME":
                ph = max(0, (-(-x.shape[1] // sh) - 1) * sh + kh
                         - x.shape[1])
                pw = max(0, (-(-x.shape[2] // sw) - 1) * sw + kw
                         - x.shape[2])
                (pt, pb), (pl, pr) = (ph // 2, ph - ph // 2), \
                    (pw // 2, pw - pw // 2)
            else:
                (pt, pb), (pl, pr) = (0, 0), (0, 0)
            xin = F.pad(nchw(x), (pl, pr, pt, pb),
                        value=float("-inf"))
            env[out_name] = nhwc(F.max_pool2d(xin, (kh, kw), (sh, sw)))

        elif op == "UPSAMPLE":
            x = env[node.inputs[0]]
            out_hw = (out_t.shape[1], out_t.shape[2])
            mode = "bilinear" if a.get("mode", 0) == 1 else "nearest"
            env[out_name] = nhwc(F.interpolate(
                nchw(x), size=out_hw, mode=mode))

        elif op in ("RESHAPE", "TRANSPOSE"):
            if op == "TRANSPOSE" and "perm" in a:
                env[out_name] = env[node.inputs[0]].permute(*a["perm"])
                continue
            x = env[node.inputs[0]]
            target = list(out_t.shape)
            if target and target[0] == 1 and x.shape[0] != 1:
                target[0] = x.shape[0]
            if target and int(np.prod(target)) == x.numel():
                env[out_name] = x.reshape(target)
            else:
                env[out_name] = x

        elif op == "SPLIT":
            x = env[node.inputs[0]]
            axis = int(a.get("axis", 3))
            sizes = [graph.tensors[o].shape[axis] for o in node.outputs]
            parts = torch.split(x, sizes, dim=axis)
            for o, p in zip(node.outputs, parts):
                env[o] = p
            continue

        else:
            raise NotImplementedError(
                f"torch_ref: op {op} not supported (f32 subset only)")

    return {o: env[o].detach().numpy() for o in graph.outputs}
