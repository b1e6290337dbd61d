"""Hand-derived known-answer tests for resolve_redirects (pointer
doubling with exact hop counts): straight chains at every length up to
the cap, over-cap chains, 2-cycles, self-loops, tails into cycles,
multi-out dedup, and NULL edges."""

from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401
from universal_key_value_based_text_processing_with_ocr_spark.operators.linkgraph import (
    resolve_redirects,
)


def _edges(spark, pairs):  # noqa: F811
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], schema="src_url string, dst_url string"
    )


def _resolve(spark, pairs, **kw):  # noqa: F811
    return {
        r.src_url: (r.final_url, r.hops, r.resolved)
        for r in resolve_redirects(_edges(spark, pairs), **kw).collect()
    }


def test_chain_exact_hops(spark):  # noqa: F811
    # a -> b -> c -> d -> T : hops count from each start exactly
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "T")]
    got = _resolve(spark, pairs)
    assert got == {
        "a": ("T", 4, True),
        "b": ("T", 3, True),
        "c": ("T", 2, True),
        "d": ("T", 1, True),
    }


def test_chain_at_and_over_cap(spark):  # noqa: F811
    # length-16 chain resolves at the default cap; length-17 does not
    c16 = [(f"n{i}", f"n{i+1}") for i in range(16)]
    got = _resolve(spark, c16)
    assert got["n0"] == ("n16", 16, True)
    c17 = [(f"m{i}", f"m{i+1}") for i in range(17)]
    got = _resolve(spark, c17)
    assert got["m0"] == (None, None, False)
    assert got["m1"] == ("m17", 16, True)


def test_cycle_and_self_loop_unresolved(spark):  # noqa: F811
    got = _resolve(spark, [("x", "y"), ("y", "x"), ("z", "z")])
    assert got == {
        "x": (None, None, False),
        "y": (None, None, False),
        "z": (None, None, False),
    }


def test_tail_into_cycle_unresolved(spark):  # noqa: F811
    got = _resolve(spark, [("t", "x"), ("x", "y"), ("y", "x")])
    assert got["t"] == (None, None, False)


def test_multi_out_keeps_lexicographic_min(spark):  # noqa: F811
    got = _resolve(spark, [("a", "zzz"), ("a", "bbb")])
    assert got == {"a": ("bbb", 1, True)}


def test_null_edges_ignored(spark):  # noqa: F811
    got = _resolve(spark, [("a", None), (None, "b"), ("c", "T")])
    assert got == {"c": ("T", 1, True)}


def test_smaller_cap(spark):  # noqa: F811
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "T")]
    got = _resolve(spark, pairs, max_hops=2)
    assert got["a"] == (None, None, False)
    assert got["c"] == ("T", 2, True)


def test_random_functional_graphs_match_python_reference(spark):  # noqa: F811
    """Property: on random functional graphs (each src one outgoing edge,
    dsts drawn from a mixed node pool so chains, merges, cycles and
    tails-into-cycles all occur), pointer doubling must agree with a
    plain Python follow-the-chain reference under the same hop cap."""
    import random

    rng = random.Random(1234)
    for trial in range(5):
        n = 120
        nodes = [f"n{trial}_{i}" for i in range(n)]
        # ~70% of nodes get an outgoing edge; targets biased toward a
        # small core so merges and cycles actually form
        pairs = []
        for i, s in enumerate(nodes):
            if rng.random() < 0.7:
                t = nodes[rng.randrange(n // 4)] if rng.random() < 0.5 else nodes[
                    rng.randrange(n)
                ]
                pairs.append((s, t))
        cap = 16
        fmap = {}
        for s, t in pairs:
            fmap[s] = min(fmap[s], t) if s in fmap else t
        exp = {}
        for s in fmap:
            cur, hops = fmap[s], 1
            while cur in fmap and hops <= cap:
                cur = fmap[cur]
                hops += 1
            if cur not in fmap and hops <= cap:
                exp[s] = (cur, hops, True)
            else:
                exp[s] = (None, None, False)
        got = _resolve(spark, pairs, max_hops=cap)
        assert got == exp, f"trial {trial}"
