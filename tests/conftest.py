import pytest

from networkit_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("networkit-spark-tests", cpus=8, shuffle_partitions=8)
    yield s


# -- golden fixtures from the reference test suite (FIXTURES.md) -----------

# CentralityGTest.cpp:243-283 — 8-node weighted undirected PageRank graph
PR8_EDGES = [
    (0, 2, 3.0), (1, 2, 2.0), (2, 3, 3.0), (2, 4, 2.0), (2, 5, 1.5),
    (3, 5, 3.0), (4, 5, 2.0), (5, 6, 3.0), (5, 7, 2.0),
]
PR8_EXPECTED = [0.0753, 0.0565, 0.2552, 0.1319, 0.0942, 0.2552, 0.0753, 0.0565]

# ConnectedComponentsGTest.cpp:24-58 — 20 nodes, 5 components (15 isolated)
CC20_EDGES = [
    (0, 1), (1, 2), (2, 4), (4, 8), (8, 16), (16, 19),
    (3, 5), (5, 6), (6, 7), (7, 9),
    (10, 11), (10, 18), (10, 12), (18, 17),
    (13, 14),
]
CC20_CANONICAL = {  # min-member component labels
    0: 0, 1: 0, 2: 0, 4: 0, 8: 0, 16: 0, 19: 0,
    3: 3, 5: 3, 6: 3, 7: 3, 9: 3,
    10: 10, 11: 10, 12: 10, 17: 10, 18: 10,
    13: 13, 14: 13,
    15: 15,
}

# CentralityGTest.cpp:716-766 — 16 nodes, 24 edges, LCC golden vector
LCC16_EDGES = [
    (2, 4), (3, 4), (4, 5), (5, 7), (6, 7), (6, 8), (6, 9), (6, 11),
    (7, 12), (8, 9), (8, 10), (8, 11), (8, 13), (9, 10), (9, 11), (9, 13),
    (10, 11), (10, 13), (10, 14), (11, 13), (11, 14), (12, 15), (13, 14),
    (14, 15),
]
LCC16_EXPECTED = [
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.5, 0.0, 0.8, 0.8, 0.8, 2.0 / 3.0,
    0.0, 0.8, 0.5, 0.0,
]

# FIXTURES.md §7 — 5-node directed PageRank smoke
DPR5_EDGES = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0), (4, 2)]
