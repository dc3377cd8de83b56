"""Measure the lastz-style anchor-interference cut on bench HSPs.

lastz processes gapped anchors in score order and discards anchors
already covered by an existing alignment (its "interference" check) —
the reference inherits that because its gapped stage IS lastz. Our
native gapped stage extends every HSP. This probe quantifies, on the
repeat-1x bench's real HSP output (BENCH_SAVE_HSPS), how many anchors a
coverage filter would skip and what it saves.

Coverage test (conservative): anchor (r, q) is covered if an accepted
alignment's ref span and query span both contain it AND the anchor
diagonal r-q lies within the alignment's [diag_min - slack, diag_max +
slack] band (slack = 16). Requires /tmp/hsps_r1x.npz and the bench
generator's genomes (same seed).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import numpy as np


def main():
    import bench as B
    from segalign_tpu.config import build_substitution_matrix
    from segalign_tpu.io.encode import revcomp_codes
    from segalign_tpu.native import gapped_extend_native
    ref, query = B.load_inputs()
    qrc = revcomp_codes(query)
    sub = build_substitution_matrix(910)

    z = np.load(os.environ.get("HSPS", "/tmp/hsps_r1x.npz"))
    jobs = []
    for k in z.files:
        rev = k.split("_")[1] == "1"
        for rs, qs, ln, sc in z[k]:
            jobs.append((int(sc), rev, int(rs + ln // 2), int(qs + ln // 2)))
    jobs.sort(reverse=True)  # score-descending, lastz order
    print(f"{len(jobs)} segments", flush=True)

    SLACK = 16
    accepted = {False: [], True: []}  # per strand: (r0,r1,q0,q1,dlo,dhi)

    def covered(rev, r, q):
        d = r - q
        for (r0, r1, q0, q1, dlo, dhi) in accepted[rev]:
            if r0 <= r <= r1 and q0 <= q <= q1 and \
                    dlo - SLACK <= d <= dhi + SLACK:
                return True
        return False

    t0 = time.time()
    nskip = nacc = ndp = 0
    for sc, rev, mr, mq in jobs:
        if covered(rev, mr, mq):
            nskip += 1
            continue
        q = qrc if rev else query
        ndp += 1
        res = gapped_extend_native(ref, q, sub, 400, 30, 9430, mr, mq)
        if res is None:
            continue
        score, r0, q0, r1, q1, ops = res
        if score >= 3000:
            nacc += 1
            # diag range from the ops walk
            d = r0 - q0
            dlo = dhi = d
            for op in ops:
                if op == ord('I'):
                    d -= 1
                elif op == ord('D'):
                    d += 1
                dlo = min(dlo, d)
                dhi = max(dhi, d)
            accepted[rev].append((r0, r1, q0, q1, dlo, dhi))
    dt = time.time() - t0
    print(f"interference: {ndp} DPs run, {nskip} skipped "
          f"({100*nskip/max(len(jobs),1):.0f}%), {nacc} accepted, "
          f"{dt:.2f}s single-thread", flush=True)


if __name__ == "__main__":
    main()
