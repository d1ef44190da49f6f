"""nested: true sub-documents — mirrors the reference's
search_nested_test.go TestNestedConjunctionQuery (company /
departments[] / employees[] / projects[] / locations[]): a conjunction
binds at the deepest common nested ancestor of its fields
(search_conjunction_nested.go joins on ancestorFromRoot(joinIdx)),
and hits are ROOT documents with child scores folded in
(collector/topn.go descAdder)."""

import pytest
from pyspark.sql import Row

from bleve_spark.index.mapping import IndexMapping, index_with_mapping
from bleve_spark.search.searcher import search_df

MAPPING = {
    "default_mapping": {
        "properties": {
            "company": {
                "properties": {
                    "id": {"fields": [{"type": "text"}]},
                    "name": {"fields": [{"type": "text"}]},
                    "departments": {
                        "nested": True,
                        "properties": {
                            "name": {"fields": [{"type": "text"}]},
                            "budget": {"fields": [{"type": "number"}]},
                            "employees": {
                                "nested": True,
                                "properties": {
                                    "name": {"fields": [{"type": "text"}]},
                                    "role": {"fields": [{"type": "text"}]},
                                },
                            },
                            "projects": {
                                "nested": True,
                                "properties": {
                                    "title": {"fields": [{"type": "text"}]},
                                    "status": {"fields": [{"type": "text"}]},
                                },
                            },
                        },
                    },
                    "locations": {
                        "nested": True,
                        "properties": {
                            "city": {"fields": [{"type": "text"}]},
                            "country": {"fields": [{"type": "text"}]},
                        },
                    },
                }
            }
        }
    }
}


def _dept(name, budget, emps, projs):
    return Row(
        name=name, budget=budget,
        employees=[Row(name=n, role=r) for n, r in emps],
        projects=[Row(title=t, status=s) for t, s in projs],
    )


def _corpus(spark):
    rows = [
        Row(doc_id="doc1", company=Row(
            id="c1", name="TechCorp",
            departments=[
                _dept("Engineering", 2000000.0,
                      [("Alice", "Engineer"), ("Bob", "Manager")],
                      [("Project X", "ongoing"),
                       ("Project Y", "completed")]),
                _dept("Sales", 300000.0,
                      [("Eve", "Salesperson"), ("Mallory", "Manager")],
                      [("Project A", "completed"),
                       ("Project B", "ongoing")]),
            ],
            locations=[Row(city="Athens", country="Greece"),
                       Row(city="Berlin", country="USA")],
        )),
        Row(doc_id="doc2", company=Row(
            id="c2", name="BizInc",
            departments=[
                _dept("Marketing", 800000.0,
                      [("Eve", "Marketer"), ("David", "Manager")],
                      [("Project Z", "ongoing"),
                       ("Project W", "planned")]),
                _dept("Engineering", 800000.0,
                      [("Frank", "Manager"), ("Grace", "Engineer")],
                      [("Project Alpha", "completed"),
                       ("Project Beta", "ongoing")]),
            ],
            locations=[Row(city="Athens", country="USA"),
                       Row(city="London", country="UK")],
        )),
        Row(doc_id="doc3", company=Row(
            id="c3", name="WebSolutions",
            departments=[
                _dept("HR", 800000.0,
                      [("Eve", "Manager"), ("Frank", "HR")],
                      [("Project Beta", "completed"),
                       ("Project B", "ongoing")]),
                _dept("Engineering", 200000.0,
                      [("Heidi", "Support Engineer"), ("Ivan", "Manager")],
                      [("Project Helpdesk", "ongoing"),
                       ("Project FAQ", "completed")]),
            ],
            locations=[Row(city="Edinburgh", country="UK"),
                       Row(city="London", country="Canada")],
        )),
    ]
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def nidx(spark):
    df = _corpus(spark)
    im = IndexMapping.from_dict(MAPPING)
    return index_with_mapping(df, ["doc_id"], im, persist=True)


def _ids(nidx, q):
    rows = search_df(nidx, q, size=10, sort=["_id"]).collect()
    return [r["doc_id"] for r in rows]


def _m(field, text):
    return {"field": field, "match": text}


def test_child_docs_are_real_docs(nidx):
    # 3 roots + 6 departments + 12 employees + 12 projects + 6 locations
    assert nidx.stats.doc_count == 39


def test_conj_same_department(nidx):
    # search_nested_test.go Test 1: Engineering AND budget >= 800000
    # in the SAME department
    q = {"conjuncts": [
        _m("company.departments.name", "Engineering"),
        {"field": "company.departments.budget", "min": 800000.0},
    ]}
    assert _ids(nidx, q) == ["doc1", "doc2"]


def test_conj_emp_and_project_same_department(nidx):
    # Test 2: employee Eve AND a completed project in her department
    q = {"conjuncts": [
        _m("company.departments.employees.name", "Eve"),
        _m("company.departments.projects.status", "completed"),
    ]}
    assert _ids(nidx, q) == ["doc1", "doc3"]


def test_conj_same_location(nidx):
    # Test 3: located in Athens, USA (same location element) AND an
    # Engineering department
    q = {"conjuncts": [
        {"conjuncts": [_m("company.locations.country", "USA"),
                       _m("company.locations.city", "Athens")]},
        _m("company.departments.name", "Engineering"),
    ]}
    assert _ids(nidx, q) == ["doc2"]


def test_conj_nested_subgroup_budget(nidx):
    # Test 4a/4b: Athens+USA AND (Engineering AND budget > 1M) → none;
    # Athens+Greece version → doc1
    loc_usa = {"conjuncts": [_m("company.locations.country", "USA"),
                             _m("company.locations.city", "Athens")]}
    dept = {"conjuncts": [
        _m("company.departments.name", "Engineering"),
        {"field": "company.departments.budget", "min": 1000000.0},
    ]}
    assert _ids(nidx, {"conjuncts": [loc_usa, dept]}) == []
    loc_gr = {"conjuncts": [_m("company.locations.country", "Greece"),
                            _m("company.locations.city", "Athens")]}
    assert _ids(nidx, {"conjuncts": [loc_gr, dept]}) == ["doc1"]


def test_conj_employee_and_project_groups(nidx):
    # Test 5a/5b: (Frank AND Manager same employee) AND
    # ("Project Beta" phrase AND status same project), joined at the
    # department level
    emp = {"conjuncts": [
        _m("company.departments.employees.name", "Frank"),
        _m("company.departments.employees.role", "Manager"),
    ]}
    proj_completed = {"conjuncts": [
        {"field": "company.departments.projects.title",
         "match_phrase": "Project Beta"},
        _m("company.departments.projects.status", "completed"),
    ]}
    proj_ongoing = {"conjuncts": [
        {"field": "company.departments.projects.title",
         "match_phrase": "Project Beta"},
        _m("company.departments.projects.status", "ongoing"),
    ]}
    assert _ids(nidx, {"conjuncts": [emp, proj_completed]}) == []
    assert _ids(nidx, {"conjuncts": [emp, proj_ongoing]}) == ["doc2"]


def test_conj_employee_and_location(nidx):
    # Test 6a/6b: (Eve AND Manager same employee) AND (London+UK /
    # London+Canada same location)
    emp = {"conjuncts": [
        _m("company.departments.employees.name", "Eve"),
        _m("company.departments.employees.role", "Manager"),
    ]}
    loc_uk = {"conjuncts": [_m("company.locations.country", "UK"),
                            _m("company.locations.city", "London")]}
    loc_ca = {"conjuncts": [_m("company.locations.country", "Canada"),
                            _m("company.locations.city", "London")]}
    assert _ids(nidx, {"conjuncts": [emp, loc_uk]}) == []
    assert _ids(nidx, {"conjuncts": [emp, loc_ca]}) == ["doc3"]


def test_root_and_nested_field_conjunction(nidx):
    # root-level field forces the join to the root context
    q = {"conjuncts": [
        _m("company.name", "TechCorp"),
        _m("company.departments.employees.role", "Engineer"),
    ]}
    assert _ids(nidx, q) == ["doc1"]


def test_hits_are_roots_with_clean_ids(nidx):
    from bleve_spark.search.searcher import search

    res = search(nidx, _m("company.departments.employees.name", "Eve"),
                 size=10)
    ids = sorted(h["id"] for h in res["hits"])
    assert ids == ["doc1", "doc2", "doc3"]
    assert all(h["score"] > 0 for h in res["hits"])


def test_nested_at_rest_matches_in_memory(nidx, spark, tmp_path):
    """The segment (at-rest) path indexes nested child rows as real
    docs; nested conjunctions and root folding produce EXACTLY the
    in-memory results (ids and scores)."""
    from bleve_spark.index.mapping import (
        IndexMapping,
        index_with_mapping_at_rest,
    )
    from bleve_spark.search.searcher import search_df

    df = _corpus(spark)
    im = IndexMapping.from_dict(MAPPING)
    at_rest = index_with_mapping_at_rest(
        df, ["doc_id"], im, str(tmp_path / "segs"), n_segments=2
    )
    assert at_rest.stats.doc_count == 39
    queries = [
        {"conjuncts": [
            _m("company.departments.name", "Engineering"),
            {"field": "company.departments.budget", "min": 800000.0},
        ]},
        {"conjuncts": [
            _m("company.departments.employees.name", "Eve"),
            _m("company.departments.projects.status", "completed"),
        ]},
        {"conjuncts": [
            {"conjuncts": [_m("company.locations.country", "USA"),
                           _m("company.locations.city", "Athens")]},
            _m("company.departments.name", "Engineering"),
        ]},
    ]
    for q in queries:
        mem = sorted(
            (r["doc_id"], round(r["score"], 6))
            for r in search_df(nidx, q, size=10).collect()
        )
        rest = sorted(
            (r["doc_id"], round(r["score"], 6))
            for r in search_df(at_rest, q, size=10).collect()
        )
        assert rest == mem, (q, mem, rest)


def test_nested_inside_per_type_mapping(spark):
    """nested: true inside a per-type document mapping (r5): the
    nested explode runs only over that type's rows — the reference
    allows nested anywhere in the mapping tree
    (mapping/document.go walk)."""
    from pyspark.sql import functions as F

    rows = [
        Row(doc_id="b1", kind="book",
            chapters=[Row(title="spark intro", pages=10),
                      Row(title="advanced joins", pages=30)],
            name=None),
        Row(doc_id="b2", kind="book",
            chapters=[Row(title="python basics", pages=20)],
            name=None),
        # a film row that ALSO carries a chapters array — the film
        # route must NOT explode it (its mapping has no nested there)
        Row(doc_id="f1", kind="film",
            chapters=[Row(title="spark intro", pages=1)],
            name="spark documentary"),
    ]
    df = spark.createDataFrame(rows)
    im = IndexMapping.from_dict({
        "type_field": "kind",
        "types": {
            "book": {
                "properties": {
                    "chapters": {
                        "nested": True,
                        "properties": {
                            "title": {"fields": [{"type": "text"}]},
                            "pages": {"fields": [{"type": "number"}]},
                        },
                    },
                },
            },
            "film": {
                # dynamic off: the film route must neither explode
                # nor flat-index its chapters array
                "dynamic": False,
                "properties": {
                    "name": {"fields": [{"type": "text"}]},
                },
            },
        },
        "scoring_model": "bm25",
    })
    idx = index_with_mapping(df, ["doc_id"], im, persist=False)
    # a nested conjunction binds inside ONE chapter: title has
    # "spark" AND pages >= 5 — true for b1's first chapter; f1's
    # chapters were not exploded, so "spark intro" there cannot match
    hits = search_df(idx, {"conjuncts": [
        {"field": "chapters.title", "match": "spark"},
        {"field": "chapters.pages", "min": 5.0},
    ]}, size=10).collect()
    assert [r["doc_id"] for r in hits] == ["b1"]
    # the film route still indexes its own fields
    hits2 = search_df(
        idx, {"field": "name", "match": "documentary"}, size=10
    ).collect()
    assert [r["doc_id"] for r in hits2] == ["f1"]
    # no cross-chapter false positive: "advanced" AND pages < 15
    # spans two different chapters of b1 — must not match
    assert search_df(idx, {"conjuncts": [
        {"field": "chapters.title", "match": "advanced"},
        {"field": "chapters.pages", "max": 15.0,
         "inclusive_max": True},
    ]}, size=10).count() == 0
