"""Cross-implementation interop against the reference's OWN vendored C++.

The probes in tests/cpp_probes/ are compiled at test time against the
untouched reference sources (/root/reference/external/kmc_api,
src/kmerBloom + external/ntHash — none of which need boost), producing
genuine reference-produced/consumed artifacts:

  * KMC1 and KMC2 databases written by bayestyper_tpu.io.kmc are listed by
    the reference's CKMCFile::ReadNextKmer and must yield the identical
    (kmer, count) stream — validating the writer against the consumer the
    reference actually uses (KmerCounter.cpp:388-524).
  * Our KmcReader must agree with the reference reader on the same files
    (including the previously untested KMC2 signature-map layout).
  * .bloomMeta/.bloomData files written by the reference's KmerBloom::save
    are loaded by ReferenceKmerBloom (and vice versa) with identical
    membership answers — hash-level (NTP64) and bit-layout compatibility.

Skipped when g++ or the reference tree is unavailable.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

REF = "/root/reference"
PROBES = os.path.join(os.path.dirname(__file__), "cpp_probes")

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None or not os.path.isdir(REF),
    reason="g++ or reference tree unavailable",
)

K = 21  # probe bloom is compiled for BT_KMER_SIZE=21


@pytest.fixture(scope="module")
def probes(tmp_path_factory):
    d = tmp_path_factory.mktemp("probes")
    kmc = str(d / "probe_kmc")
    subprocess.run(
        ["g++", "-O1", "-std=c++14", "-o", kmc,
         os.path.join(PROBES, "probe_kmc.cpp"),
         os.path.join(REF, "external/kmc_api/kmc_file.cpp"),
         os.path.join(REF, "external/kmc_api/kmer_api.cpp"),
         os.path.join(REF, "external/kmc_api/mmer.cpp"),
         "-I", os.path.join(REF, "external/kmc_api")],
        check=True, capture_output=True,
    )
    bloom = str(d / "probe_bloom")
    subprocess.run(
        ["g++", "-O1", "-std=c++14", f"-DBT_KMER_SIZE={K}", "-o", bloom,
         os.path.join(PROBES, "probe_bloom.cpp"),
         os.path.join(REF, "src/kmerBloom/KmerBloom.cpp"),
         "-I", os.path.join(REF, "include"),
         "-I", os.path.join(REF, "include/kmerBloom"),
         "-I", os.path.join(REF, "external")],
        check=True, capture_output=True,
    )
    return dict(kmc=kmc, bloom=bloom)


def _random_kmers(rng, n, k):
    """Canonical (hi, lo) lanes + strings for n distinct random k-mers."""
    from bayestyper_tpu.io.kmc import count_kmers_from_sequences

    seq = "".join(rng.choice(list("ACGT"), 4 * n + k))
    hi, lo, _ = count_kmers_from_sequences([seq.encode()], k)
    take = min(n, len(hi))
    return hi[:take], lo[:take]


def _lanes_to_strings(hi, lo, k):
    n_hi = min(27, k)
    out = []
    for h, l in zip(hi.tolist(), lo.tolist()):
        s = []
        for j in range(n_hi):
            s.append("ACGT"[(h >> (2 * (n_hi - 1 - j))) & 3])
        for j in range(n_hi, k):
            s.append("ACGT"[(l >> (2 * (k - 1 - j))) & 3])
        out.append("".join(s))
    return out


def _reference_listing(probe, prefix):
    r = subprocess.run([probe, prefix], check=True, capture_output=True,
                       text=True)
    rows = [ln.split("\t") for ln in r.stdout.splitlines() if ln]
    return {kmer: int(c) for kmer, c in rows}


def _our_listing(prefix, k):
    from bayestyper_tpu.io.kmc import KmcReader

    reader = KmcReader(prefix)
    assert reader.info.kmer_length == k
    out = {}
    for hi, lo, counts in reader.batches(batch_size=1000):
        for s, c in zip(_lanes_to_strings(hi, lo, k), counts.tolist()):
            out[s] = int(c)
    reader.close()
    return out


@pytest.mark.parametrize("layout", ["kmc1", "kmc2"])
def test_kmc_writer_read_by_reference_api(probes, tmp_path, layout):
    from bayestyper_tpu.io.kmc import write_kmc1, write_kmc2

    rng = np.random.default_rng(41)
    hi, lo = _random_kmers(rng, 3000, K)
    counts = rng.integers(1, 1000, len(hi)).astype(np.uint64)
    prefix = str(tmp_path / f"db_{layout}")
    if layout == "kmc1":
        write_kmc1(prefix, hi, lo, counts, kmer_length=K)
    else:
        write_kmc2(prefix, hi, lo, counts, kmer_length=K,
                   signature_len=5, num_bins=8)

    want = dict(zip(_lanes_to_strings(hi, lo, K), counts.tolist()))
    got_ref = _reference_listing(probes["kmc"], prefix)
    assert got_ref == want, (
        f"reference kmc_api listing disagrees: {len(got_ref)} vs {len(want)}"
    )
    got_ours = _our_listing(prefix, K)
    assert got_ours == want


def test_kmc2_empty_prefix_runs(probes, tmp_path):
    """Sparse prefixes (long empty LUT runs) exercise the sentinel-slot and
    run-skip logic on both readers."""
    from bayestyper_tpu.io.kmc import write_kmc2

    rng = np.random.default_rng(42)
    hi, lo = _random_kmers(rng, 64, K)
    counts = np.full(len(hi), 7, np.uint64)
    prefix = str(tmp_path / "db_sparse")
    write_kmc2(prefix, hi, lo, counts, kmer_length=K, signature_len=3,
               num_bins=4)
    want = dict(zip(_lanes_to_strings(hi, lo, K), counts.tolist()))
    assert _reference_listing(probes["kmc"], prefix) == want
    assert _our_listing(prefix, K) == want


def test_bloom_written_by_reference_read_by_us(probes, tmp_path):
    from bayestyper_tpu.ops.nthash import ReferenceKmerBloom

    rng = np.random.default_rng(43)
    hi, lo = _random_kmers(rng, 500, K)
    strings = _lanes_to_strings(hi, lo, K)
    prefix = str(tmp_path / "refbloom")
    subprocess.run([probes["bloom"], "write", prefix],
                   input="\n".join(strings), text=True, check=True)

    bloom = ReferenceKmerBloom.load(prefix)
    assert bloom.kmer_size == K
    assert bool(np.all(bloom.contains(hi, lo)))

    # absent kmers: FPR must be near the designed 0.001
    ahi, alo = _random_kmers(np.random.default_rng(99), 2000, K)
    present = set(strings)
    mask = np.array([s not in present
                     for s in _lanes_to_strings(ahi, alo, K)])
    fp = float(np.mean(bloom.contains(ahi[mask], alo[mask])))
    assert fp < 0.01, fp


def test_bloom_written_by_us_read_by_reference(probes, tmp_path):
    from bayestyper_tpu.ops.nthash import ReferenceKmerBloom

    rng = np.random.default_rng(44)
    hi, lo = _random_kmers(rng, 500, K)
    strings = _lanes_to_strings(hi, lo, K)
    bloom = ReferenceKmerBloom.with_optimal_parameters(len(hi), 0.001, K)
    bloom.add(hi, lo)
    prefix = str(tmp_path / "ourbloom")
    bloom.save(prefix)

    r = subprocess.run([probes["bloom"], "read", prefix],
                       input="\n".join(strings), text=True, check=True,
                       capture_output=True)
    answers = [int(x) for x in r.stdout.split()]
    assert answers == [1] * len(strings)

    # absent kmers through the reference reader: low FPR
    ahi, alo = _random_kmers(np.random.default_rng(98), 2000, K)
    present = set(strings)
    astr = [s for s in _lanes_to_strings(ahi, alo, K) if s not in present]
    r = subprocess.run([probes["bloom"], "read", prefix],
                       input="\n".join(astr), text=True, check=True,
                       capture_output=True)
    answers = np.array([int(x) for x in r.stdout.split()])
    assert answers.mean() < 0.01
