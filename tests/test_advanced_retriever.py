"""AdvancedRetriever surface parity — schema/collection validation and
the metadata filter matrix, mirroring the reference test expectations
(reference tests/advanced_retriever/advanced_retriever_test.py:51-605,
same fixtures, same expected id sets)."""

import pytest

from retriv_ray.compat import AdvancedRetriever

SCHEMA = {
    "id": "id",
    "lyrics": "text",
    "year": "number",
    "ozzy": "bool",
    "album": "keyword",
    "genre": "keywords",
}

COLLECTION = [
    {
        "id": "doc_0",
        "lyrics": "Generals gathered in their masses",
        "album": "Black Sabbath",
        "year": 1969,
        "ozzy": True,
        "genre": ["Doom", "Heavy Metal"],
    },
    {
        "id": "doc_1",
        "lyrics": "Just like witches at black masses",
        "album": "Paranoid",
        "year": 1970,
        "ozzy": True,
        "genre": ["Doom", "Heavy Metal"],
    },
    {
        "id": "doc_2",
        "lyrics": "Evil minds that plot destruction",
        "album": "Heaven and Hell",
        "year": 1980,
        "ozzy": False,
        "genre": ["Heavy Metal"],
    },
]


@pytest.fixture(scope="module")
def se(ray_session):
    return AdvancedRetriever(SCHEMA, index_name="adv-test").index(COLLECTION)


# -- schema validation ------------------------------------------------


def test_check_schema_no_id():
    with pytest.raises(Exception, match="Schema must contain an id field"):
        AdvancedRetriever({"text": "text"})


def test_check_schema_invalid_key():
    with pytest.raises(Exception, match="Schema keys must be strings"):
        AdvancedRetriever({"id": "id", 1: "text"})


def test_check_schema_invalid_value():
    with pytest.raises(Exception, match="not supported"):
        AdvancedRetriever({"id": "id", "x": "floatzz"})


def test_check_schema_double_text():
    with pytest.raises(Exception, match="Only one field can be text"):
        AdvancedRetriever({"id": "id", "a": "text", "b": "text"})


def test_check_collection_errors():
    ar = AdvancedRetriever(SCHEMA, index_name="adv-err")
    with pytest.raises(ValueError, match="has no id"):
        ar.check_collection([{"lyrics": "x"}], SCHEMA)
    with pytest.raises(ValueError, match="Field year not in doc"):
        ar.check_collection(
            [{"id": "d", "lyrics": "x", "album": "a", "ozzy": True, "genre": []}],
            SCHEMA,
        )
    with pytest.raises(ValueError, match="Field extra not in schema"):
        ar.check_collection([dict(COLLECTION[0], extra=1)], SCHEMA)
    with pytest.raises(TypeError, match="wrong type"):
        ar.check_collection([dict(COLLECTION[0], year="1969")], SCHEMA)
    with pytest.raises(TypeError, match="wrong type"):
        ar.check_collection([dict(COLLECTION[0], ozzy="yes")], SCHEMA)
    with pytest.raises(TypeError, match="wrong type"):
        ar.check_collection([dict(COLLECTION[0], genre="Doom")], SCHEMA)
    assert ar.check_collection(COLLECTION, SCHEMA)


# -- filter matrix (reference :293-459) -------------------------------


def test_filter_bool(se):
    assert se.filter_doc_ids("ozzy", "must", True).tolist() == [0, 1]
    assert se.filter_doc_ids("ozzy", "must", False).tolist() == [2]
    assert se.filter_doc_ids("ozzy", "must not", True).tolist() == [2]
    assert se.filter_doc_ids("ozzy", "must not", False).tolist() == [0, 1]


def test_filter_keyword(se):
    assert se.filter_doc_ids("album", "must", "Black Sabbath").tolist() == [0]
    assert se.filter_doc_ids("album", "must", "Paranoid").tolist() == [1]
    assert se.filter_doc_ids("album", "must", "Heaven and Hell").tolist() == [2]
    assert se.filter_doc_ids(
        "album", "must", ["Black Sabbath", "Heaven and Hell"]
    ).tolist() == [0, 2]
    assert se.filter_doc_ids("album", "must not", "Black Sabbath").tolist() == [1, 2]
    assert se.filter_doc_ids("album", "must not", "Heaven and Hell").tolist() == [0, 1]
    assert se.filter_doc_ids(
        "album", "must not", ["Black Sabbath", "Heaven and Hell"]
    ).tolist() == [1]
    assert se.filter_doc_ids(
        "album", "must not", ["Black Sabbath", "Paranoid"]
    ).tolist() == [2]


def test_filter_number(se):
    assert se.filter_doc_ids("year", "must", 1969, "eq").tolist() == [0]
    assert se.filter_doc_ids("year", "must", 1969, "gt").tolist() == [1, 2]
    assert se.filter_doc_ids("year", "must", 1969, "gte").tolist() == [0, 1, 2]
    assert se.filter_doc_ids("year", "must", 1970, "lt").tolist() == [0]
    assert se.filter_doc_ids("year", "must", 1970, "lte").tolist() == [0, 1]
    assert se.filter_doc_ids("year", "must", [1970, 1980], "between").tolist() == [1, 2]
    assert se.filter_doc_ids("year", "must not", 1969, "eq").tolist() == [1, 2]
    assert se.filter_doc_ids("year", "must not", 1969, "gt").tolist() == [0]
    assert se.filter_doc_ids("year", "must not", 1970, "lte").tolist() == [2]
    assert se.filter_doc_ids("year", "must not", [1970, 1980], "between").tolist() == [0]


def test_filter_keywords(se):
    assert se.filter_doc_ids("genre", "must", "Doom", "or").tolist() == [0, 1]
    assert se.filter_doc_ids(
        "genre", "must", ["Doom", "Heavy Metal"], "or"
    ).tolist() == [0, 1, 2]
    assert se.filter_doc_ids("genre", "must not", "Doom", "or").tolist() == [2]
    assert se.filter_doc_ids(
        "genre", "must not", ["Doom", "Heavy Metal"], "or"
    ).tolist() == []
    assert se.filter_doc_ids(
        "genre", "must", ["Doom", "Heavy Metal"], "and"
    ).tolist() == [0, 1]
    assert se.filter_doc_ids(
        "genre", "must not", ["Doom", "Heavy Metal"], "and"
    ).tolist() == [2]


def test_get_filtered_doc_ids(se):
    filters = [
        dict(field="year", clause="must", value=1969, operator="gte"),
        dict(field="ozzy", clause="must", value=True),
    ]
    assert se.get_filtered_doc_ids(filters).tolist() == [0, 1]


def test_format_filters(se):
    out = se.format_filters(
        {"year": ("gte", 1970), "ozzy": True, "album": ["Paranoid"]}
    )
    assert dict(field="year", clause="must", value=1970, operator="gte") in out
    assert dict(field="ozzy", clause="must", value=True) in out
    assert se.format_filters({}) == []


# -- search matrix (reference :501-605) -------------------------------


def test_search_filters_only(se):
    query = {
        "year": ("gte", 1970),
        "ozzy": True,
        "album": ["Paranoid", "Heaven and Hell"],
        "genre": ("or", ["Doom", "Heavy Metal"]),
    }
    res = se.search(query=query, return_docs=False)
    assert len(res) == 1 and res["doc_1"] == 1.0

    res = se.search(
        query={
            "where": {
                "year": ("gt", 1969),
                "album": ["Paranoid", "Heaven and Hell"],
                "genre": ("or", ["Doom", "Heavy Metal"]),
            }
        },
        return_docs=False,
    )
    assert len(res) == 2 and res["doc_1"] == 1.0 and res["doc_2"] == 1.0

    res = se.search(
        query={
            "where_not": {
                "year": ("gt", 1969),
                "ozzy": False,
                "album": ["Paranoid", "Heaven and Hell"],
            }
        },
        return_docs=False,
    )
    assert len(res) == 1 and res["doc_0"] == 1.0


def test_search_or_and(se):
    res = se.search(query="witches masses", return_docs=False)
    assert len(res) == 2 and "doc_0" in res and "doc_1" in res
    res = se.search(query="witches masses", return_docs=False, operator="AND")
    assert len(res) == 1 and "doc_1" in res


def test_advanced_search(se):
    query = {
        "text": "witches masses",
        "year": ("gte", 1970),
        "ozzy": True,
        "album": ["Paranoid", "Heaven and Hell"],
        "genre": ("or", ["Doom", "Heavy Metal"]),
    }
    res = se.search(query=query, return_docs=False)
    assert len(res) == 1 and "doc_1" in res


def test_search_with_subset_doc_ids(se):
    res = se.search(
        query="witches masses", subset_doc_ids=["doc_1", "doc_2"], return_docs=False
    )
    assert len(res) == 1 and "doc_1" in res


def test_return_docs_carries_fields(se):
    docs = se.search(query="witches masses", cutoff=1)
    assert docs[0]["id"] == "doc_1"
    assert docs[0]["lyrics"] == "Just like witches at black masses"
    assert docs[0]["album"] == "Paranoid"


def test_load_roundtrip(se):
    lr = AdvancedRetriever.load("adv-test")
    assert lr.schema == SCHEMA
    res = lr.search(query="witches masses", return_docs=False)
    assert "doc_1" in res
