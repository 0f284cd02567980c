

def test_split_loose_clusters_edge_cases():
    """_split_loose_clusters only fires when sparse AND dense clusters
    coexist and the loose total stays tiny (the hoist prepass is dense over
    loose x rays)."""
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

    # all clusters sparse -> untouched (no dense cluster to keep)
    slots = np.array([0, 1] + [-1] * 14 + [2] + [-1] * 15, np.int64)
    out, n_loose = _split_loose_clusters(slots, cs)
    assert n_loose == 0 and (out == slots).all()

    # loose total above LOOSE_TOTAL_MAX -> untouched
    many = []
    for c in range(4):                      # 4 sparse clusters x 5 = 20 > 16
        many += [100 + 5 * c + i for i in range(5)] + [-1] * 11
    slots = np.concatenate([np.arange(16), np.array(many)]).astype(np.int64)
    out, n_loose = _split_loose_clusters(slots, cs)
    assert n_loose == 0 and (out == slots).all()

    # single cluster -> untouched
    slots = np.array([0, 1] + [-1] * 14, np.int64)
    out, n_loose = _split_loose_clusters(slots, cs)
    assert n_loose == 0
