"""Node/Tree model invariants (reference: tests/test_tree_structures.py)."""

from raptor_rag_spark.kernels.summarize import extractive_summary, get_text
from raptor_rag_spark.model import Node, Tree, get_embeddings, get_node_list, reverse_mapping


def test_node_construction(sample_nodes):
    node = sample_nodes[0]
    assert node.index == 0
    assert node.children == set()
    assert len(node.embeddings["test_model"]) == 8


def test_tree_invariants(sample_tree):
    assert len(sample_tree.all_nodes) == 7
    assert sample_tree.num_layers == 1
    for root in sample_tree.root_nodes.values():
        assert root.children
    for leaf in sample_tree.leaf_nodes.values():
        assert not leaf.children
    # children of roots cover exactly the leaves
    covered = set().union(*(r.children for r in sample_tree.root_nodes.values()))
    assert covered == set(sample_tree.leaf_nodes)


def test_single_node_tree():
    n = Node("only", 0, set(), {"m": [1.0]})
    t = Tree({0: n}, {0: n}, {0: n}, 0, {0: [n]})
    assert t.num_layers == 0
    assert t.root_nodes == t.leaf_nodes


def test_get_node_list_sorted(sample_nodes):
    shuffled = {k: sample_nodes[k] for k in [3, 1, 4, 0, 2]}
    assert [n.index for n in get_node_list(shuffled)] == [0, 1, 2, 3, 4]


def test_get_embeddings(sample_nodes):
    embs = get_embeddings(get_node_list(sample_nodes), "test_model")
    assert len(embs) == 5 and len(embs[0]) == 8


def test_reverse_mapping(sample_tree):
    m = reverse_mapping(sample_tree.layer_to_nodes)
    assert m[0] == 0 and m[5] == 1 and m[6] == 1
    assert len(m) == 7


def test_get_text_exact_format():
    assert get_text([]) == ""
    out = get_text(["line1\nline2", "second node"])
    assert out == "line1 line2\n\nsecond node\n\n"


def test_extractive_summary():
    ctx = "First sentence here. Second sentence follows. Third one is longer than needed."
    s = extractive_summary(ctx, max_tokens=6)
    assert s.startswith("First sentence here")
    assert "Third" not in s
    # at least one sentence even with a tiny budget
    assert extractive_summary(ctx, max_tokens=1) != ""
