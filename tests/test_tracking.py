"""MOT trackers: identity persistence, lost-track recovery, class gating."""

import numpy as np
import pytest

from ir_ads_tpu.detection.tracking import HungarianIOUTracker, IOUTracker


@pytest.mark.parametrize("cls", [IOUTracker, HungarianIOUTracker])
def test_identity_persists_across_frames(cls):
    tr = cls(iou_threshold=0.3)
    b0 = np.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], float)
    t0 = tr.update(b0, np.asarray([0, 1]), np.asarray([0.9, 0.8]))
    ids0 = {tuple(t.box[:2]): t.track_id for t in t0}
    # objects move slightly
    b1 = b0 + 2.0
    t1 = tr.update(b1, np.asarray([0, 1]), np.asarray([0.9, 0.8]))
    assert len(t1) == 2
    assert {t.track_id for t in t1} == {t.track_id for t in t0}


@pytest.mark.parametrize("cls", [IOUTracker, HungarianIOUTracker])
def test_lost_track_survives_gap(cls):
    tr = cls(iou_threshold=0.3, max_lost_frames=2)
    b = np.asarray([[0, 0, 10, 10]], float)
    t0 = tr.update(b, np.asarray([0]), np.asarray([0.9]))
    tid = t0[0].track_id
    tr.update(np.zeros((0, 4)), np.zeros(0, int), np.zeros(0))  # missed frame
    t2 = tr.update(b, np.asarray([0]), np.asarray([0.9]))
    assert t2[0].track_id == tid
    # after exceeding max_lost_frames the track dies
    for _ in range(3):
        tr.update(np.zeros((0, 4)), np.zeros(0, int), np.zeros(0))
    t_new = tr.update(b, np.asarray([0]), np.asarray([0.9]))
    assert t_new[0].track_id != tid


def test_class_gating():
    tr = HungarianIOUTracker(iou_threshold=0.3, track_same_class_only=True)
    b = np.asarray([[0, 0, 10, 10]], float)
    t0 = tr.update(b, np.asarray([0]), np.asarray([0.9]))
    # same box, different class -> new identity
    t1 = tr.update(b, np.asarray([1]), np.asarray([0.9]))
    assert t1[0].track_id != t0[0].track_id


def test_hungarian_resolves_crossing():
    """Two crossing boxes: optimal assignment keeps identities by IoU."""
    tr = HungarianIOUTracker(iou_threshold=0.1)
    a = np.asarray([[0, 0, 10, 10], [20, 0, 30, 10]], float)
    t0 = tr.update(a, np.zeros(2, int), np.ones(2))
    id_left = [t.track_id for t in t0 if t.box[0] == 0][0]
    # boxes move toward each other but remain closest to their origins
    b = np.asarray([[4, 0, 14, 10], [16, 0, 26, 10]], float)
    t1 = tr.update(b, np.zeros(2, int), np.ones(2))
    left_now = [t.track_id for t in t1 if t.box[0] == 4][0]
    assert left_now == id_left
