"""Round-5 knob sweep on the repeat-1x bench workload (real TPU).

For each env-knob config: build a fresh aligner, one cold pass (compiles,
hopefully persistent-cache hits for repeated shapes), then a steady pass
whose wall is the signal. The continuation knobs (CONT cohort size,
W_CONT window width, UNROLL steps/iteration) shape the while-loop
round/iteration count, which the round-4 findings put at ~1 ms pipeline
stall per data-dependent iteration — on repeat-dense data survivors are
many, so rounds dominate.

Usage: python scripts/probe_r5_sweep.py [config_index ...]
"""

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

CONFIGS = [
    ("default", {}),
    ("CONT8k", {"SEGALIGN_CONT": "8192"}),
    ("CONT16k", {"SEGALIGN_CONT": "16384"}),
    ("WCONT4k", {"SEGALIGN_WCONT": "4096"}),
    ("CONT16k+WCONT4k", {"SEGALIGN_CONT": "16384",
                         "SEGALIGN_WCONT": "4096"}),
    ("UNROLL4", {"SEGALIGN_UNROLL": "4"}),
    ("W256", {"SEGALIGN_WINDOW": "256"}),
    ("W768", {"SEGALIGN_WINDOW": "768"}),
    ("CONT32k", {"SEGALIGN_CONT": "32768"}),
    ("CONT16k+UNROLL4", {"SEGALIGN_CONT": "16384",
                         "SEGALIGN_UNROLL": "4"}),
    ("CONT16k+W256", {"SEGALIGN_CONT": "16384",
                      "SEGALIGN_WINDOW": "256"}),
    ("TILED", {"SEGALIGN_TILED": "1"}),
    ("TILED+CONT16k", {"SEGALIGN_TILED": "1", "SEGALIGN_CONT": "16384"}),
]


def main():
    sel = [int(a) for a in sys.argv[1:]] or range(len(CONFIGS))
    import bench as B
    ref, query = B.load_inputs()
    from segalign_tpu.io.encode import revcomp_codes
    qrc = revcomp_codes(query)
    base = {k: os.environ.get(k) for _, cfg in CONFIGS for k in cfg}
    for i in sel:
        name, cfg = CONFIGS[i]
        for k, v in base.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        os.environ.update(cfg)
        al, _, _ = B.make_aligner()
        r1 = B.run_config(ref, query, f"{name}-cold", al=al, qrc=qrc)
        r2 = B.run_config(ref, query, f"{name}-steady", al=al, qrc=qrc,
                          skip_setup=True)
        print(f"SWEEP {name}: cold={r1['dt']:.2f}s steady={r2['dt']:.2f}s "
              f"hsps={r2['stats']['hsps']}", flush=True)
        del al, r1, r2
        gc.collect()


if __name__ == "__main__":
    main()
