"""Speaker clustering tests."""

import numpy as np

from omnilingual_asr_tpu.diarization.cluster import ahc_labels, speaker_names


def make_embeds(rng, centers, counts, noise=0.05):
    out = []
    for c, n in zip(centers, counts):
        out.append(c[None, :] + noise * rng.standard_normal((n, len(c))))
    return np.concatenate(out)


class TestAHC:
    def test_two_clear_speakers(self, rng):
        c1 = np.array([1.0, 0.0, 0.0, 0.0])
        c2 = np.array([0.0, 1.0, 0.0, 0.0])
        x = make_embeds(rng, [c1, c2], [5, 5])
        labels = ahc_labels(x)
        assert labels.max() == 1
        assert (labels[:5] == 0).all()
        assert (labels[5:] == 1).all()

    def test_speaker_count_hint_forces_k(self, rng):
        # three loose groups, hint forces exactly 2 clusters
        cs = [np.eye(4)[i] for i in range(3)]
        x = make_embeds(rng, cs, [4, 4, 4])
        labels = ahc_labels(x, n_clusters=2)
        assert labels.max() == 1

    def test_hint_of_one(self, rng):
        x = rng.standard_normal((6, 8))
        labels = ahc_labels(x, n_clusters=1)
        assert (labels == 0).all()

    def test_first_appearance_ordering(self, rng):
        c1 = np.array([1.0, 0.0, 0.0, 0.0])
        c2 = np.array([0.0, 1.0, 0.0, 0.0])
        # speaker B talks first
        x = make_embeds(rng, [c2, c1, c2], [2, 3, 2])
        labels = ahc_labels(x)
        assert labels[0] == 0  # first heard speaker gets label 0
        names = speaker_names(labels)
        assert names[0] == "Speaker 1"

    def test_single_segment(self):
        labels = ahc_labels(np.ones((1, 4)))
        assert labels.tolist() == [0]

    def test_empty(self):
        assert ahc_labels(np.zeros((0, 4))).shape == (0,)

    def test_identical_embeddings_merge(self):
        x = np.ones((5, 4))
        labels = ahc_labels(x)
        assert labels.max() == 0

    def test_hint_larger_than_n(self, rng):
        x = rng.standard_normal((3, 4))
        labels = ahc_labels(x, n_clusters=10)
        assert len(set(labels.tolist())) == 3
