"""Property-based round-trip tests (hypothesis) for the N-Quads codec.

One Spark job per property run: hypothesis generates the corpus
driver-side, Spark formats and re-parses it in batch.
"""

from hypothesis import given, settings, strategies as st

from janus_spark.sources.nquads import format_nquads, parse_nquads_lines

# literal values with the characters that stress escaping: quotes,
# backslashes, unicode, spaces (newlines/tabs excluded — the reference's
# line-oriented format cannot represent them either)
literal_st = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_characters="\n\r\t",
        exclude_categories=("Cs",),
    ),
    min_size=1,
    max_size=40,
).filter(lambda s: s.strip() != "" and not s.startswith(("http://", "https://", "urn:", "_:")))

iri_st = st.from_regex(r"http://example\.org/[A-Za-z0-9_]{1,12}", fullmatch=True)


@settings(max_examples=20, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**12),  # ts
            iri_st,  # subject
            iri_st,  # predicate
            st.one_of(iri_st, literal_st),  # object
            st.one_of(st.just(""), iri_st),  # graph
        ),
        min_size=1,
        max_size=30,
    )
)
def test_nquads_round_trip_property(spark, rows):
    quads = spark.createDataFrame(rows, ["ts", "subject", "predicate", "object", "graph"])
    back = parse_nquads_lines(format_nquads(quads))
    a = sorted(map(tuple, quads.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b, f"round-trip mismatch: {set(a) ^ set(b)}"
