"""Validates the libstdc++ unordered_map iteration-order model against a
compiled probe (ground truth). Correction-output parity depends on this
model (POA start-node tie-breaks)."""

import os
import random
import shutil
import subprocess
import textwrap

import pytest

from metamdbg_tpu.utils.stdmap import UnorderedMapOrder

PROBE_SRC = textwrap.dedent("""
    #include <unordered_map>
    #include <cstdint>
    #include <cstdio>
    int main(){
        size_t n; if(scanf("%zu",&n)!=1) return 1;
        std::unordered_map<uint32_t,int> m;
        for(size_t i=0;i<n;i++){ uint32_t k; scanf("%u",&k); m[k]=1; }
        printf("%zu\\n", m.bucket_count());
        for(auto& it : m) printf("%u\\n", it.first);
        return 0;
    }
""")


@pytest.fixture(scope="module")
def probe(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    d = tmp_path_factory.mktemp("stdmap_probe")
    src = os.path.join(d, "probe.cpp")
    exe = os.path.join(d, "probe")
    with open(src, "w") as f:
        f.write(PROBE_SRC)
    subprocess.run(["g++", "-O2", "-o", exe, src], check=True)
    return exe


def _probe_order(exe, keys):
    inp = f"{len(keys)}\n" + "\n".join(map(str, keys)) + "\n"
    out = subprocess.run([exe], input=inp, capture_output=True,
                         text=True).stdout.split()
    return int(out[0]), [int(x) for x in out[1:]]


def test_sequential_and_random_orders(probe):
    rng = random.Random(7)
    cases = [list(range(n)) for n in (1, 13, 14, 29, 30, 60, 128, 700)]
    for _ in range(12):
        cases.append(rng.sample(range(2 ** 31), rng.randrange(1, 900)))
    for keys in cases:
        bc, ref_order = _probe_order(probe, keys)
        m = UnorderedMapOrder()
        for k in keys:
            m.insert(k)
        assert m.bucket_count == bc
        assert m.iteration_order() == ref_order
