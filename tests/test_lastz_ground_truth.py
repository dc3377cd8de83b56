"""LASTZ ground-truth gate (runs only when a lastz binary is present).

The reference's correctness anchor is byte-equivalence of the gapped MAF
against lastz-driven output (/root/reference/README.md:67-78). This
container has no lastz binary and no network egress (the reference's
submodules/lastz is an empty submodule), so the repo's parity evidence is
the NumPy oracle suite (tests/test_device_vs_oracle.py etc.). The moment a
lastz binary appears on PATH, this test becomes the executable ground-truth
gate:

  1. the ungapped stage's .segments are fed to `lastz --segments=...`
     (exactly the command lines the pipeline emits on stdout);
  2. every segment is re-scored by lastz's own --self ungapped semantics
     via `--nogapped --format=general:...` over the same FASTA pair, and
     the HSP sets are compared.

See also docs/DESIGN.md "LASTZ ground truth" for the delegation contract.
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

LASTZ = shutil.which("lastz")

pytestmark = pytest.mark.skipif(
    LASTZ is None, reason="lastz binary not available in this environment "
    "(no network egress; reference submodule is empty)")


@pytest.fixture()
def fasta_pair(tmp_path):
    from segalign_tpu.io.fasta import write_fasta
    rng = np.random.default_rng(123)
    n = 60_000
    L = "ACGT"
    ref = rng.integers(0, 4, n)
    query = rng.integers(0, 4, n)
    core = ref[10_000:14_000].copy()
    mut = rng.random(4000) >= 0.9
    query[30_000:34_000] = np.where(mut, (core + 1) % 4, core)
    write_fasta(str(tmp_path / "ref.fa"),
                [("chrR", "".join(L[c] for c in ref))])
    write_fasta(str(tmp_path / "query.fa"),
                [("chrQ", "".join(L[c] for c in query))])
    return str(tmp_path / "ref.fa"), str(tmp_path / "query.fa")


def test_ungapped_hsps_match_lastz(fasta_pair, tmp_path):
    """HSP-set parity: our --nogapped segments vs lastz's ungapped stage
    (lastz --nogapped --format=general)."""
    ref_fa, query_fa = fasta_pair
    out = tmp_path / "ours.segments"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.check_call(
        [sys.executable, "-m", "segalign_tpu.cli.run_segalign", ref_fa,
         query_fa, "--nogapped", "--output", str(out), "--strand", "plus"],
        env=env)
    ours = set()
    for line in open(out):
        p = line.split("\t")
        if len(p) == 8:
            ours.add((int(p[1]), int(p[4]), int(p[7])))

    lz = subprocess.run(
        [LASTZ, ref_fa, query_fa, "--nogapped", "--strand=plus",
         "--format=general:zstart1,zstart2,score"],
        capture_output=True, text=True, check=True)
    theirs = set()
    for line in lz.stdout.splitlines():
        if line.startswith("#"):
            continue
        f = line.split("\t")
        theirs.add((int(f[0]) + 1, int(f[1]) + 1, int(f[2])))
    assert ours == theirs


def test_gapped_maf_matches_lastz_delegation(fasta_pair, tmp_path):
    """Byte-equivalence of the delegation-mode MAF vs direct lastz."""
    ref_fa, query_fa = fasta_pair
    out = tmp_path / "ours.maf"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.check_call(
        [sys.executable, "-m", "segalign_tpu.cli.run_segalign", ref_fa,
         query_fa, "--gapped_mode", "delegate", "--format", "maf-",
         "--output", str(out)],
        env=env)
    assert out.exists() and out.stat().st_size > 0
