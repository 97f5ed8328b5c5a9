"""Property-based fuzz of the sv1_ query-string codec (hypothesis)."""

import datetime
import decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from cloudfabric_eventsourcing_spark.queries import Filter, FilterConnector, ProjectionQuery
from cloudfabric_eventsourcing_spark.queries import querystring as qs

# wire-representable scalar values (bool serializes as True/False which the
# parse ladder recovers; strings survive sanitization incl. specials)
value_st = st.one_of(
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.text(
        alphabet=st.characters(
            whitelist_categories=("L", "N", "P", "S", "Z"),
            whitelist_characters=".&!$'|#",
            max_codepoint=0x2FFF,
        ),
        max_size=30,
    ),
    st.decimals(
        allow_nan=False, allow_infinity=False, places=4,
        min_value=decimal.Decimal("-1e12"), max_value=decimal.Decimal("1e12"),
    ),
    st.datetimes(
        min_value=datetime.datetime(1990, 1, 1),
        max_value=datetime.datetime(2100, 1, 1),
        timezones=st.just(datetime.timezone.utc),
    ),
    st.none(),
)

prop_st = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N"), whitelist_characters="_."),
    min_size=1,
    max_size=20,
)

op_st = st.sampled_from(["eq", "ne", "gt", "ge", "lt", "le", "string-contains", "array-contains"])


@st.composite
def filter_st(draw, depth=0):
    f = Filter(draw(prop_st), draw(op_st), draw(value_st))
    if depth < 2:
        for _ in range(draw(st.integers(0, 2 if depth == 0 else 1))):
            child = draw(filter_st(depth=depth + 1))  # type: ignore[arg-type]
            f.filters.append(FilterConnector(draw(st.sampled_from(["and", "or"])), child))
    return f


def normalize_string_value(v):
    # documented reference-parity lossiness: deserialization re-detects
    # types, so a STRING that looks like another wire type (bool/number/
    # date/uuid after desanitization) comes back as that type unless quoted
    # values survive. Our codec quotes strings, so only quote-stripping
    # edge cases remain: leading quote chars.
    return v


@settings(max_examples=300, deadline=None)
@given(filter_st())
def test_filter_roundtrip_values_and_shape(f):
    wire = qs.serialize_filter(f)
    back = qs.deserialize_filter(wire)

    def flat(x, acc):
        acc.append((x.property_name, x.operator, x.value))
        for c in x.filters:
            acc.append(("__logic__", c.logic, None))
            flat(c.filter, acc)
        return acc

    a = flat(f, [])
    b = flat(back, [])
    assert len(a) == len(b)
    for (pa, oa, va), (pb, ob, vb) in zip(a, b):
        assert pa == pb
        assert oa == ob
        if isinstance(va, str) and va.startswith("'"):
            # leading apostrophe strings collide with the quote marker —
            # reference has the same ambiguity; value still a string
            assert isinstance(vb, str) or vb is None
        elif isinstance(va, decimal.Decimal):
            assert vb == va or (isinstance(vb, int) and vb == va)
        else:
            assert vb == va, (va, vb)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(filter_st(), max_size=3),
    st.integers(0, 1000),
    st.one_of(st.none(), st.integers(1, 500)),
)
def test_query_roundtrip(filters, offset, limit):
    q = ProjectionQuery(filters=filters, offset=offset, limit=limit)
    q2 = qs.deserialize_query(qs.serialize_query(q))
    assert q2.offset == offset and q2.limit == limit
    assert len(q2.filters) == len(filters)
