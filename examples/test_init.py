#!/usr/bin/env python3
"""Bring-up smoke test (the examples/test_init.c analog).

init -> hw info -> tensor create -> model load -> numbered PASS/FAIL
transcript, self-verifying like every reference example.
"""

import sys

import numpy as np


def main() -> int:
    from thingino_accel_tpu import api

    steps = []

    def check(name, ok):
        steps.append(ok)
        print(f"  [{'+' if ok else 'x'}] {name}")
        return ok

    print("[1] Initializing accelerator...")
    check("nna_init", api.nna_init() == api.NNA_SUCCESS)

    print("[2] Hardware info...")
    info = api.nna_get_hw_info()
    print(f"    device: {info.device_kind} ({info.platform}), "
          f"{info.num_devices} device(s)")
    check("hw info", info.num_devices >= 1)

    print("[3] Tensor create/fill...")
    t = api.Tensor("probe", (1, 32, 32, 3), np.int8, scale=0.5)
    t.set_data(np.ones((1, 32, 32, 3), np.int8))
    check("tensor", int(t.data.sum()) == 32 * 32 * 3)

    print("[4] Model zoo load + run...")
    from thingino_accel_tpu.models import zoo
    from thingino_accel_tpu.runtime import Engine
    eng = Engine(zoo.build_tiny(zoo.ZooConfig(dtype="int8", in_hw=(32, 32)),
                                in_hw=(32, 32)))
    out = eng.run_np(np.zeros((1, 32, 32, 3), np.int8))
    check("inference", list(out.values())[0].shape == (1, 26, 26, 64))

    print("[5] Cleanup...")
    check("nna_deinit", api.nna_deinit() == api.NNA_SUCCESS)

    ok = all(steps)
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
