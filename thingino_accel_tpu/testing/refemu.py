"""Reference-runtime emulator: a numpy model of what the C runtime
actually computes, buffer quirks included.

This is the parity oracle for the TPU engine: it transliterates the
observable semantics of ``src/mars/mars_runtime.c`` + ``mxu_conv.c``
faithfully — including the parts a clean implementation would fix:

- the round-robin work-buffer planner (``mars_runtime.c:240-337``): every
  runtime tensor aliases one of 2-3 ping-pong buffers, so layers the
  runtime skips (depthwise/avgpool/softmax/transpose/reshape,
  ``:1168-1213``) leave *stale* bytes for their consumers;
- int8 conv via the MXU kernels' arithmetic: int32 accumulate, f32
  ``combined_scale`` multiply, round-half-away-from-zero, clamp
  (``mxu_conv.c:222-248``); NHWC path indexes OHWI weights, NCHW path
  OIHW (``mxu_conv.c:470+,254-407``);
- elementwise requant rules exactly as coded (reciprocal-multiply for
  mul/add, divide for sigmoid/bn, +0.5 truncation).

Integer paths are exact (int64 accumulation replicates int32 within
range); f32 conv uses float32 math with the C loop's summation order on
small shapes.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from thingino_accel_tpu.formats import mars as M


def _round_half_away(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.float32)
    return np.trunc(x + np.where(x >= 0, np.float32(0.5),
                                 np.float32(-0.5))).astype(np.int64)


def _round_plus_half(x: np.ndarray) -> np.ndarray:
    return np.trunc(x.astype(np.float32) + np.float32(0.5)).astype(np.int64)


def _clamp_i8(x: np.ndarray) -> np.ndarray:
    return np.clip(x, -128, 127).astype(np.int8)


class RefEmulator:
    """Execute a parsed MarsModel with the C runtime's semantics."""

    def __init__(self, model: M.MarsModel, num_buffers: Optional[int] = None):
        self.model = model
        self.tensors = {t.id: t for t in model.tensors}
        # --- the double/triple-buffer planner (mars_runtime.c:240-337) ---
        runtime = [t for t in model.tensors if not t.is_weight]
        self.num_buffers = num_buffers or (3 if len(runtime) else 2)
        max_size = max((self._byte_size(t) + 63) & ~63
                       for t in runtime) if runtime else 64
        self.buffers = [np.zeros(max_size, np.uint8)
                        for _ in range(self.num_buffers)]
        self.assign: Dict[int, int] = {}
        bi = 0
        for t in model.tensors:
            if t.is_weight:
                continue
            self.assign[t.id] = bi % self.num_buffers
            bi += 1

    def _byte_size(self, t: M.MarsTensor) -> int:
        # tensor_byte_size (mars_runtime.c:80-124)
        elem = t.dtype.itemsize
        if t.format == M.Format.NDHWC32 and len(t.shape) >= 4:
            n, c, h, w = t.shape[:4]
            return n * (-(-c // 32)) * h * w * 32 * elem
        numel = t.numel()
        return max(numel * elem, 1)

    # -- tensor IO -----------------------------------------------------------

    def view(self, tid: int) -> np.ndarray:
        """The live bytes a tensor aliases (C: tensor->vaddr)."""
        t = self.tensors[tid]
        if t.is_weight:
            return np.frombuffer(
                self.model.weight_bytes(t).tobytes(), np.uint8).copy()
        return self.buffers[self.assign[tid]]

    def read(self, tid: int) -> np.ndarray:
        t = self.tensors[tid]
        raw = self.view(tid)[:self._byte_size(t)]
        return np.frombuffer(raw.tobytes(), t.dtype.np)[:t.numel()] \
            .reshape(t.shape)

    def write(self, tid: int, arr: np.ndarray) -> None:
        t = self.tensors[tid]
        raw = np.ascontiguousarray(arr, t.dtype.np).tobytes()
        buf = self.buffers[self.assign[tid]]
        buf[:len(raw)] = np.frombuffer(raw, np.uint8)

    def set_input(self, arr: np.ndarray, index: int = 0) -> None:
        self.write(self.model.input_ids[index], arr)

    def get_output(self, index: int = 0) -> np.ndarray:
        return self.read(self.model.output_ids[index])

    # -- execution -----------------------------------------------------------

    def run(self) -> None:
        for layer in self.model.layers:
            self._execute(layer)

    def _execute(self, layer: M.MarsLayer) -> None:
        lt = M.LayerType
        t = layer.type
        if t == lt.CONV2D:
            self._conv2d(layer)
        elif t in (lt.RELU, lt.RELU6, lt.LEAKY_RELU):
            self._relu(layer, leaky=(t == lt.LEAKY_RELU))
        elif t == lt.SIGMOID:
            self._sigmoid(layer)
        elif t == lt.MUL:
            self._mul_add(layer, mul=True)
        elif t == lt.ADD:
            self._mul_add(layer, mul=False)
        elif t == lt.MAXPOOL:
            self._maxpool(layer)
        elif t == lt.CONCAT:
            self._concat(layer)
        elif t == lt.UPSAMPLE:
            self._upsample(layer)
        elif t == lt.BATCHNORM:
            self._batchnorm(layer)
        # everything else: accepted no-op (mars_runtime.c:1168-1213)

    def _conv2d(self, layer: M.MarsLayer) -> None:
        p: M.ConvParams = layer.params
        it = self.tensors[layer.inputs[0]]
        ot = self.tensors[layer.outputs[0]]
        wt = self.tensors[p.weight_tensor_id]
        bt = self.tensors.get(p.bias_tensor_id) \
            if p.bias_tensor_id != M.NO_TENSOR else None

        is_nhwc = it.format == M.Format.NHWC
        out_nhwc = ot.format == M.Format.NHWC
        if is_nhwc:
            _, in_h, in_w, in_c = it.shape
        else:
            _, in_c, in_h, in_w = it.shape
        if out_nhwc:
            _, out_h, out_w, out_c = ot.shape
        else:
            _, out_c, out_h, out_w = ot.shape

        pad_top = pad_left = 0
        if p.padding == M.Padding.SAME:
            pad_h = (out_h - 1) * p.stride_h + p.kernel_h - in_h
            pad_w = (out_w - 1) * p.stride_w + p.kernel_w - in_w
            pad_top, pad_left = pad_h // 2, pad_w // 2
        elif p.padding == M.Padding.EXPLICIT:
            pad_top, pad_left = p.pad_top, p.pad_left

        is_float = it.dtype == M.DType.FLOAT32
        x = self.read(layer.inputs[0]).reshape(it.shape)
        wraw = self.view(p.weight_tensor_id)

        if is_float:
            w = np.frombuffer(wraw.tobytes(), np.float32)
            bias = None
            if bt is not None:
                bias = np.frombuffer(self.view(bt.id).tobytes(), np.float32)
            out = self._conv_f32(x[0], w, bias, in_c, in_h, in_w,
                                 out_c, out_h, out_w, p, pad_top, pad_left)
        else:
            w = np.frombuffer(wraw.tobytes(), np.int8)
            bias = None
            if bt is not None:
                bias = np.frombuffer(self.view(bt.id).tobytes(), np.int32)
            cs = np.float32(np.float32(it.scale) * np.float32(wt.scale)) \
                / np.float32(ot.scale)
            out = self._conv_i8(x[0], w, bias, in_c, in_h, in_w,
                                out_c, out_h, out_w, p, pad_top, pad_left,
                                cs, is_nhwc)
            # fused RELU post-pass clamps quantized values at 0
            # (mars_runtime.c:701-707)
            if p.activation == M.Activation.RELU:
                out = np.maximum(out, 0)
        self.write(layer.outputs[0], out)

    def _conv_i8(self, x, wflat, bias, in_c, in_h, in_w, out_c, out_h,
                 out_w, p, pt, pl, cs, nhwc):
        import torch
        if nhwc:
            xn = x.reshape(in_h, in_w, in_c).astype(np.float64)
            xn = np.transpose(xn, (2, 0, 1))                 # C,H,W
            w = wflat[:out_c * p.kernel_h * p.kernel_w * in_c].reshape(
                out_c, p.kernel_h, p.kernel_w, in_c).astype(np.float64)
            w = np.transpose(w, (0, 3, 1, 2))                # OIHW
        else:
            xn = x.reshape(in_c, in_h, in_w).astype(np.float64)
            w = wflat[:out_c * in_c * p.kernel_h * p.kernel_w].reshape(
                out_c, in_c, p.kernel_h, p.kernel_w).astype(np.float64)
        # zero-pad to cover the C loop's implicit bounds check; float64
        # conv == exact integer arithmetic for int8 values
        pb = max(0, (out_h - 1) * p.stride_h + p.kernel_h - in_h - pt)
        pr = max(0, (out_w - 1) * p.stride_w + p.kernel_w - in_w - pl)
        xp = np.zeros((xn.shape[0], in_h + pt + pb, in_w + pl + pr))
        xp[:, pt:pt + in_h, pl:pl + in_w] = xn
        acc = torch.nn.functional.conv2d(
            torch.tensor(xp[None]), torch.tensor(w),
            stride=(p.stride_h, p.stride_w)).numpy()[0]
        acc = acc[:, :out_h, :out_w]
        s = acc.astype(np.int64)
        if bias is not None:
            s = s + bias[:out_c, None, None].astype(np.int64)
        q = _clamp_i8(np.clip(
            _round_half_away(np.float32(cs) * s.astype(np.int32)
                             .astype(np.float32)),
            -(1 << 31), (1 << 31) - 1))
        if nhwc:
            return np.transpose(q, (1, 2, 0))               # H,W,C
        return q

    def _conv_f32(self, x, wflat, bias, in_c, in_h, in_w, out_c, out_h,
                  out_w, p, pt, pl):
        """conv2d_float32_mxu: f32 sums in [ic][kh][kw] order
        (mxu_conv.c:417-456). Small shapes only (python loops)."""
        xn = x.reshape(in_c, in_h, in_w).astype(np.float32)
        w = wflat[:out_c * in_c * p.kernel_h * p.kernel_w].reshape(
            out_c, in_c, p.kernel_h, p.kernel_w).astype(np.float32)
        out = np.zeros((out_c, out_h, out_w), np.float32)
        for oc in range(out_c):
            for oh in range(out_h):
                for ow in range(out_w):
                    s = np.float32(bias[oc]) if bias is not None \
                        else np.float32(0)
                    for ic in range(in_c):
                        for kh in range(p.kernel_h):
                            ih = oh * p.stride_h - pt + kh
                            if not 0 <= ih < in_h:
                                continue
                            for kw in range(p.kernel_w):
                                iw = ow * p.stride_w - pl + kw
                                if 0 <= iw < in_w:
                                    s = np.float32(
                                        s + xn[ic, ih, iw] * w[oc, ic, kh, kw])
                    out[oc, oh, ow] = s
        return out

    def _relu(self, layer, leaky: bool) -> None:
        it = self.tensors[layer.inputs[0]]
        x = self.read(layer.inputs[0])
        alpha = np.float32(0.01) if leaky else np.float32(0.0)
        if it.dtype == M.DType.FLOAT32:
            out = np.where(x > 0, x, x * alpha).astype(np.float32)
        else:
            neg = np.maximum(
                np.trunc(x.astype(np.float32) * alpha), -128).astype(np.int8)
            out = np.where(x > 0, x, neg if leaky else np.int8(0))
        self.write(layer.outputs[0], out)

    def _sigmoid(self, layer) -> None:
        it = self.tensors[layer.inputs[0]]
        ot = self.tensors[layer.outputs[0]]
        x = self.read(layer.inputs[0])
        if it.dtype == M.DType.FLOAT32:
            out = (1.0 / (1.0 + np.exp(-x, dtype=np.float32))).astype(
                np.float32)
        else:
            xf = x.astype(np.float32) * np.float32(it.scale)
            y = np.float32(1.0) / (np.float32(1.0)
                                   + np.exp(-xf, dtype=np.float32))
            os = np.float32(ot.scale) if ot.scale > 0 else np.float32(1.0)
            out = _clamp_i8(_round_plus_half(y / os))
        self.write(layer.outputs[0], out)

    def _mul_add(self, layer, mul: bool) -> None:
        at = self.tensors[layer.inputs[0]]
        bt = self.tensors[layer.inputs[1]]
        ot = self.tensors[layer.outputs[0]]
        a = self.read(layer.inputs[0])
        b = self.read(layer.inputs[1]).reshape(a.shape)
        if at.dtype == M.DType.FLOAT32:
            out = (a * b if mul else a + b).astype(np.float32)
        else:
            va = a.astype(np.float32) * np.float32(at.scale)
            vb = b.astype(np.float32) * np.float32(bt.scale)
            y = va * vb if mul else va + vb
            os = np.float32(ot.scale) if ot.scale > 0 else np.float32(1.0)
            inv = np.float32(1.0) / os
            out = _clamp_i8(_round_plus_half(y * inv))
        self.write(layer.outputs[0], out)

    def _maxpool(self, layer) -> None:
        p: M.PoolParams = layer.params
        it = self.tensors[layer.inputs[0]]
        ot = self.tensors[layer.outputs[0]]
        # C reads int8 bytes regardless of dtype (mars_runtime.c:931-932)
        _, in_h, in_w, c = it.shape
        _, out_h, out_w, _ = ot.shape
        raw = self.view(layer.inputs[0])[:self._byte_size(it)]
        x = np.frombuffer(raw.tobytes(), np.int8)[:in_h * in_w * c] \
            .reshape(in_h, in_w, c)
        out = np.full((out_h, out_w, c), -128, np.int8)
        for oh in range(out_h):
            for ow in range(out_w):
                ys = oh * p.stride_h
                xs = ow * p.stride_w
                win = x[ys:min(ys + p.kernel_h, in_h),
                        xs:min(xs + p.kernel_w, in_w)]
                if win.size:
                    out[oh, ow] = win.reshape(-1, c).max(axis=0)
        buf = self.buffers[self.assign[ot.id]]
        raw_out = out.tobytes()
        buf[:len(raw_out)] = np.frombuffer(raw_out, np.uint8)

    def _concat(self, layer) -> None:
        ot = self.tensors[layer.outputs[0]]
        _, out_h, out_w, out_c = ot.shape
        out = np.zeros((out_h, out_w, out_c), np.int8)
        off = 0
        for tid in layer.inputs:
            it = self.tensors[tid]
            in_c = it.shape[3]
            raw = self.view(tid)[:out_h * out_w * in_c]
            x = np.frombuffer(raw.tobytes(), np.int8).reshape(
                out_h, out_w, in_c)
            out[:, :, off:off + in_c] = x
            off += in_c
        self.write(layer.outputs[0], out)

    def _upsample(self, layer) -> None:
        p: M.UpsampleParams = layer.params
        it = self.tensors[layer.inputs[0]]
        ot = self.tensors[layer.outputs[0]]
        _, in_h, in_w, c = it.shape
        _, out_h, out_w, _ = ot.shape
        sh = p.scale_h if p.scale_h > 0 else out_h // in_h
        sw = p.scale_w if p.scale_w > 0 else out_w // in_w
        raw = self.view(layer.inputs[0])[:in_h * in_w * c]
        x = np.frombuffer(raw.tobytes(), np.int8).reshape(in_h, in_w, c)
        oy = np.minimum(np.arange(out_h) // sh, in_h - 1)
        ox = np.minimum(np.arange(out_w) // sw, in_w - 1)
        out = x[oy][:, ox]
        self.write(layer.outputs[0], out)

    def _batchnorm(self, layer) -> None:
        it = self.tensors[layer.inputs[0]]
        ot = self.tensors[layer.outputs[0]]
        st = self.tensors.get(layer.inputs[1]) if len(layer.inputs) > 1 \
            else None
        bt = self.tensors.get(layer.inputs[2]) if len(layer.inputs) > 2 \
            else None
        shape = [d if d > 0 else 1 for d in (list(it.shape) + [1] * 4)[:4]]
        n, c, h, w = shape
        x = self.read(layer.inputs[0]).reshape(n, c, h, w)
        s = np.frombuffer(self.view(st.id).tobytes(), np.float32)[:c] \
            if st is not None else np.ones(c, np.float32)
        b = np.frombuffer(self.view(bt.id).tobytes(), np.float32)[:c] \
            if bt is not None else np.zeros(c, np.float32)
        if it.dtype == M.DType.FLOAT32:
            out = (x * s[None, :, None, None]
                   + b[None, :, None, None]).astype(np.float32)
        else:
            ins = np.float32(it.scale) if it.scale > 0 else np.float32(1.0)
            os = np.float32(ot.scale) if ot.scale > 0 else np.float32(1.0)
            xf = x.astype(np.float32) * ins
            y = xf * s[None, :, None, None] + b[None, :, None, None]
            out = _clamp_i8(_round_plus_half(y / os))
        self.write(layer.outputs[0], out)
