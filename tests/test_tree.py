"""Tests for TreeStructure (reference: treeqp/utils/tree.c)."""

import numpy as np
import pytest

from treeqp_tpu.utils.tree import TreeStructure, number_of_nodes_multistage


def test_number_of_nodes_multistage():
    # formula at reference tree.c:36-48
    assert number_of_nodes_multistage(3, 2, 10) == (10 - 2) * 9 + (27 - 1) // 2
    assert number_of_nodes_multistage(2, 1, 3) == 7
    assert number_of_nodes_multistage(1, 0, 5) == 6
    assert number_of_nodes_multistage(2, 2, 2) == 7  # full binary tree depth 2


def test_multistage_tree_shape():
    t = TreeStructure.multistage(md=2, Nr=2, Nh=3, nx=3, nu=1)
    assert t.Nn == 11
    assert t.Nh == 3
    # stages: 1 root, 2, 4, 4
    assert np.array_equal(np.bincount(t.stage), [1, 2, 4, 4])
    # leaves have nu = 0
    leaves = t.nkids == 0
    assert all(t.nu_np[leaves] == 0)
    assert all(t.nu_np[~leaves] == 1)
    assert t.Kmax == 2


def test_asymmetric_tree_from_nkids():
    # the random_qp.c:71-78 asymmetric tree: 0 -> {1, 2}, 1 -> {3, 4}, 2 -> {5}
    t = TreeStructure.from_nkids([2, 2, 1, 0, 0, 0], nx=[2] * 6, nu=[1] * 6)
    assert t.parent == (-1, 0, 0, 1, 1, 2)
    assert tuple(t.stage) == (0, 1, 1, 2, 2, 2)
    assert t.kids[1] == (3, 4)
    assert t.num_groups == 3
    assert list(t.group_nodes) == [0, 1, 2]
    # group of node: lambda_1, lambda_2 live in the root group
    assert list(t.group_of_node[1:]) == [0, 0, 1, 1, 2]
    assert list(t.sib_index) == [0, 0, 1, 0, 1, 0]
    # block tree over groups: groups 1,2 (nodes 1,2) have dad group 0
    assert list(t.group_dad) == [-1, 0, 0]
    assert list(t.group_slot[1:]) == [0, 1]


def test_group_layout_multistage():
    t = TreeStructure.multistage(md=3, Nr=2, Nh=10, nx=4, nu=1)
    assert t.Nn == number_of_nodes_multistage(3, 2, 10)
    # all non-leaf nodes are groups
    assert t.num_groups == t.Nn - 9
    # valid slots count equals Nn - 1 edges
    assert int(t.kids_valid.sum()) == t.Nn - 1
    # stage grouping covers all groups exactly once
    tot = sum(len(g) for g in t.groups_by_stage)
    assert tot == t.num_groups


def test_realizations():
    t = TreeStructure.multistage(md=3, Nr=2, Nh=4, nx=2, nu=1)
    # children of branching nodes get 0..md-1, chains inherit
    for c in range(1, t.Nn):
        p = t.parent[c]
        if t.nkids[p] > 1:
            assert t.realization[c] == t.sib_index[c]
        else:
            assert t.realization[c] == t.realization[p] or p == 0


def test_topological_order_required():
    with pytest.raises(AssertionError):
        TreeStructure.from_parent([-1, 2, 0], [1, 1, 1], [0, 0, 0])
