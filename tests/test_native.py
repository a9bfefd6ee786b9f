"""Native host runtime (C++ graph-builder / packer) vs Python fallback."""

import numpy as np
import pytest

from treeqp_tpu.utils import native
from treeqp_tpu.utils.tree import TreeStructure


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_topology_matches_python():
    nk = [2, 2, 1, 0, 0, 0]
    parent, stage, sib, nkids = native.build_topology(nk)
    t = TreeStructure.from_parent([-1, 0, 0, 1, 1, 2], [2] * 6, [1] * 6)
    assert parent.tolist()[1:] == list(t.parent[1:])
    assert stage.tolist() == t.stage.tolist()
    assert sib.tolist() == t.sib_index.tolist()
    assert nkids.tolist() == t.nkids.tolist()


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_multistage_nk_matches():
    from treeqp_tpu.utils.tree import number_of_nodes_multistage

    md, Nr, Nh = 3, 2, 6
    nn = number_of_nodes_multistage(md, Nr, Nh)
    nk = native.multistage_nk(md, Nr, Nh, nn)
    t = TreeStructure.multistage(md, Nr, Nh, nx=2, nu=1)
    assert nk.tolist() == t.nkids.tolist()


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_pack_colmajor_matches():
    rng = np.random.default_rng(0)
    rows = [2, 3, 1]
    cols = [2, 1, 4]
    blocks = [rng.standard_normal(r * c) for r, c in zip(rows, cols)]
    out = native.pack_colmajor(blocks, rows, cols, rmax=3, cmax=4)
    for n, (r, c) in enumerate(zip(rows, cols)):
        expect = blocks[n].reshape(c, r).T  # column-major -> [r, c]
        assert np.array_equal(out[n, :r, :c], expect)
        assert np.all(out[n, r:, :] == 0) and np.all(out[n, :, c:] == 0)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_large_tree_via_native():
    t = TreeStructure.multistage(md=4, Nr=4, Nh=12, nx=4, nu=1)
    assert t.Nn == (12 - 4) * 256 + (4**5 - 1) // 3
    assert t.parent[1] == 0


def test_cpp_embedding_api_golden_dataset():
    """The C++ embedding API (treeqp_cpp.hpp: TreeQp / TdunesSolver,
    treeqp_cpp_interface.hpp:43-175 analog) solves a reference golden
    dataset end-to-end through the JSON protocol bridge: JSON parse ->
    string-keyed data classes -> CLI solve -> solution parse, matching
    the embedded optimum at the reference unit-test bar (random_qp.c:
    249-254)."""
    import os
    import subprocess

    cpp_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "treeqp_tpu", "interfaces", "cpp")
    subprocess.run(["make", "-s", "treeqp_cpp_demo"], cwd=cpp_dir, check=True)
    dataset = "/root/reference/examples/random_qp_utils/data01.json"
    if not os.path.exists(dataset):
        pytest.skip("reference datasets unavailable")
    env = dict(os.environ, TREEQP_ROOT=os.path.dirname(cpp_dir) and
               os.path.dirname(os.path.dirname(os.path.dirname(cpp_dir))))
    res = subprocess.run([os.path.join(cpp_dir, "treeqp_cpp_demo"), dataset],
                         env=env, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stdout + res.stderr
