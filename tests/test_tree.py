import pytest

from hal_tpu.tree import Tree


def make_tree():
    # ((a,b)anc1,(c,d)anc2)root
    t = Tree()
    t.add_root("root")
    t.add_child("root", "anc1", 0.1)
    t.add_child("root", "anc2", 0.2)
    t.add_child("anc1", "a", 0.3)
    t.add_child("anc1", "b", 0.4)
    t.add_child("anc2", "c", 0.5)
    t.add_child("anc2", "d", 0.6)
    return t


def test_newick_roundtrip():
    t = make_tree()
    s = t.to_newick()
    t2 = Tree.from_newick(s)
    assert t2.to_newick() == s
    assert t2.root == "root"
    assert t2.children("anc1") == ["a", "b"]
    assert t2.branch_length("d") == pytest.approx(0.6)


def test_newick_unnamed_ancestors():
    t = Tree.from_newick("((a:0.1,b:0.2):0.5,c:0.3);")
    assert t.leaves() == sorted(["a", "b", "c"]) or set(t.leaves()) == {"a", "b", "c"}
    assert t.parent("a") == t.parent("b")
    assert t.parent(t.parent("a")) == t.root


def test_lca_and_path():
    t = make_tree()
    assert t.lca("a", "b") == "anc1"
    assert t.lca("a", "c") == "root"
    assert t.lca("a", "anc1") == "anc1"
    assert t.path("a", "c") == ["a", "anc1", "root", "anc2", "c"]
    assert t.path("a", "a") == ["a"]
    assert t.path("a", "root") == ["a", "anc1", "root"]


def test_spanning_tree():
    t = make_tree()
    assert t.spanning_tree(["a", "b"]) == {"a", "b", "anc1"}
    assert t.spanning_tree(["a", "c"]) == {"a", "anc1", "root", "anc2", "c"}
    assert t.spanning_tree(["a", "b", "c"]) == {"a", "b", "anc1", "root", "anc2", "c"}


def test_traversals():
    t = make_tree()
    pre = list(t.preorder())
    assert pre[0] == "root"
    assert set(pre) == {"root", "anc1", "anc2", "a", "b", "c", "d"}
    post = list(t.postorder())
    assert post[-1] == "root"
    assert post.index("a") < post.index("anc1")


def test_surgery():
    t = make_tree()
    t.remove_leaf("d")
    assert "d" not in t
    assert t.children("anc2") == ["c"]
    t.rename("anc1", "ancX")
    assert t.parent("a") == "ancX"
    assert t.children("root") == ["ancX", "anc2"]
    removed = t.remove_subtree("ancX")
    assert set(removed) == {"ancX", "a", "b"}
    assert t.children("root") == ["anc2"]
