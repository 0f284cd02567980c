

def test_split_loose_clusters_edge_cases():
    """_split_loose_clusters fires whenever the loose total stays tiny (the
    hoist prepass is dense over loose x rays); with no dense cluster left
    the tail IS the whole table and the orchestrator skips the triangle
    kernel launch."""
    import numpy as np

    from toroidal_ray_tracing_tpu.scene.build import _split_loose_clusters

    cs = 16
    # one dense + one sparse cluster -> sparse rows move to a tail cluster
    slots = np.concatenate([np.arange(16),
                            [16, 17] + [-1] * 14]).astype(np.int64)
    out, n_loose = _split_loose_clusters(slots, cs)
    assert n_loose == 2
    assert list(out[:16]) == list(range(16))
    assert list(out[16:18]) == [16, 17] and (out[18:] == -1).all()

    # all clusters sparse -> everything compacts into one tail cluster
    # (plane-only scenes: no kernel launch at all)
    slots = np.array([0, 1] + [-1] * 14 + [2] + [-1] * 15, np.int64)
    out, n_loose = _split_loose_clusters(slots, cs)
    assert n_loose == 3
    assert list(out[:3]) == [0, 1, 2] and (out[3:] == -1).all()
    assert len(out) == cs

    # loose total above LOOSE_TOTAL_MAX -> untouched
    many = []
    for c in range(4):                      # 4 sparse clusters x 5 = 20 > 16
        many += [100 + 5 * c + i for i in range(5)] + [-1] * 11
    slots = np.concatenate([np.arange(16), np.array(many)]).astype(np.int64)
    out, n_loose = _split_loose_clusters(slots, cs)
    assert n_loose == 0 and (out == slots).all()

    # single sparse cluster -> all-loose (live-first compaction)
    slots = np.array([-1, 5, -1, 3] + [-1] * 12, np.int64)
    out, n_loose = _split_loose_clusters(slots, cs)
    assert n_loose == 2 and list(out[:2]) == [5, 3] and (out[2:] == -1).all()

    # single DENSE cluster -> untouched (nothing loose)
    slots = np.arange(16, dtype=np.int64)
    out, n_loose = _split_loose_clusters(slots, cs)
    assert n_loose == 0 and (out == slots).all()

    # empty clusters drop from the dense region entirely
    slots = np.concatenate([np.arange(16), np.full(16, -1),
                            [16, 17] + [-1] * 14]).astype(np.int64)
    out, n_loose = _split_loose_clusters(slots, cs)
    assert n_loose == 2 and len(out) == 2 * cs
    assert list(out[:16]) == list(range(16))
    assert list(out[16:18]) == [16, 17]
