"""Property-based tests (hypothesis) for the pure invariant-carrying
primitives — the SURVEY §5 strategy extended with generative inputs:
filters and probes that must hold for ANY input, not just the goldens.

Spark-free by design (each hypothesis example must be microseconds):
the JVM expressions these mirror are contract/oracle-checked at the
plan level; here we fuzz the Python-side kernels and path/encoding
helpers whose edge cases goldens can't enumerate.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

u64s = st.lists(
    st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=200
)


class TestBloomProperties:
    @settings(max_examples=200, deadline=None)
    @given(added=u64s, probed=u64s)
    def test_no_false_negatives_ever(self, added, probed):
        """The Bloom contract decontam correctness rests on: anything
        added is ALWAYS reported present, for any hash set and any
        filter size (including absurdly small, collision-heavy ones)."""
        from imitation_learning_data_pipeline_spark.functions.bloom import Bloom64

        bloom = Bloom64(m_bits=64, k=2)  # tiny on purpose
        bloom.add_many(added)
        if added:
            hits = bloom.contains_many(np.array(added, dtype=np.int64))
            assert bool(hits.all())
        # probing never crashes and returns one bool per input
        got = bloom.contains_many(np.array(probed, dtype=np.int64))
        assert len(got) == len(probed)

    @settings(max_examples=50, deadline=None)
    @given(
        added=st.lists(
            st.integers(min_value=0, max_value=2**62),
            min_size=50,
            max_size=200,
            unique=True,
        ),
        probe_seed=st.integers(min_value=0, max_value=2**31),
    )
    def test_sized_filter_bounds_false_positives(self, added, probe_seed):
        """Bloom64.build sizes the bit array for the requested fpp; on
        random disjoint probes the observed FP rate must stay within a
        loose multiple of it (statistical bound, generous slack; tiny
        degenerate filters + adversarially correlated probes are out of
        scope — the product path always builds from ≥thousands of
        shingle hashes)."""
        from imitation_learning_data_pipeline_spark.functions.bloom import Bloom64

        bloom = Bloom64.build(added, fpp=0.01)
        rng = np.random.default_rng(probe_seed)
        probe = rng.integers(-(2**63), 2**62, size=2000, dtype=np.int64)
        probe = probe[~np.isin(probe, np.array(added, dtype=np.int64))]
        fp = bloom.contains_many(probe).sum() / len(probe)
        assert fp <= 0.1  # 10x slack over the 1% target

    def test_build_rejects_empty_is_safe(self):
        from imitation_learning_data_pipeline_spark.functions.bloom import Bloom64

        bloom = Bloom64.build([1], fpp=0.01)
        assert bloom.contains_many(np.array([1], dtype=np.int64)).all()


class TestNormKeyProperties:
    @settings(max_examples=300, deadline=None)
    @given(s=st.text(max_size=100))
    def test_idempotent_on_any_string(self, s):
        """_norm_key must be a fixpoint map (repeated decode terminates
        and re-applying changes nothing) — the property the merge
        commit's path matching depends on."""
        from imitation_learning_data_pipeline_spark.pipeline.merge import _norm_key

        once = _norm_key(s)
        assert _norm_key(once) == once

    @settings(max_examples=100, deadline=None)
    @given(
        scheme=st.from_regex(r"[A-Za-z][A-Za-z0-9+.-]{0,8}", fullmatch=True),
        # no leading slash: the normalizer collapses ALL slashes after
        # the scheme into the single root slash (file:///x ≡ /x)
        rest=st.from_regex(r"([a-z0-9_.-][a-z0-9/_.-]{0,39})?", fullmatch=True),
    )
    def test_scheme_stripped(self, scheme, rest):
        from imitation_learning_data_pipeline_spark.pipeline.merge import _norm_key

        assert _norm_key(f"{scheme}://{rest}") == _norm_key(f"/{rest}")

    def test_double_encoding_collapses(self):
        """The hive-escape + URI-encode stack: part=a%253Ab (file_path)
        and part=a%3Ab (listing) must normalize identically."""
        from imitation_learning_data_pipeline_spark.pipeline.merge import _norm_key

        assert _norm_key("file:/t/part=a%253Ab/f.parquet") == _norm_key(
            "/t/part=a%3Ab/f.parquet"
        )


class TestMp4ProbeFuzz:
    @settings(max_examples=150, deadline=None)
    @given(blob=st.binary(max_size=2048))
    def test_arbitrary_bytes_never_crash(self, blob, tmp_path_factory):
        """The pure-Python ISO-BMFF walker runs on UNTRUSTED media
        bytes in the validate stage: any input must produce a dict (ok
        or error), never an exception — truncated boxes, lying sizes,
        zero-length loops included."""
        from imitation_learning_data_pipeline_spark.operators.media_probe import (
            probe_mp4_python,
        )

        p = tmp_path_factory.mktemp("fuzz") / "f.mp4"
        p.write_bytes(blob)
        out = probe_mp4_python(str(p))
        assert isinstance(out, dict)

    @settings(max_examples=150, deadline=None)
    @given(blob=st.binary(min_size=8, max_size=2048))
    def test_mp4_prefixed_garbage_never_crashes(self, blob, tmp_path_factory):
        """Same, but with a plausible ftyp header so the walker commits
        to parsing the box tree before hitting the garbage."""
        from imitation_learning_data_pipeline_spark.operators.media_probe import (
            probe_mp4_python,
        )

        header = (len(blob) + 16).to_bytes(4, "big") + b"ftypisom"
        p = tmp_path_factory.mktemp("fuzz2") / "g.mp4"
        p.write_bytes(header + blob)
        out = probe_mp4_python(str(p))
        assert isinstance(out, dict)


class TestHashRecipeParity:
    @settings(max_examples=300, deadline=None)
    @given(key=st.text(min_size=1, max_size=50), seed=st.text(max_size=10))
    def test_python_md5_recipe_bounds(self, key, seed):
        """The md5→top-32-bits→unit-interval recipe (mirrored in every
        oracle): u ∈ [0, 1) for any key/seed, and seeded vs unseeded
        digests diverge (no seed-collapse)."""
        import hashlib

        payload = f"{seed}|{key}" if seed else key
        u = int(hashlib.md5(payload.encode()).hexdigest()[:8], 16) / 2**32
        assert 0.0 <= u < 1.0

    @settings(max_examples=100, deadline=None)
    @given(n=st.integers(min_value=1, max_value=4096), key=st.integers(min_value=0, max_value=2**62))
    def test_shard_bucket_in_range(self, n, key):
        """floor(u·n) ∈ [0, n) for every key and shard count — the
        export_shards partition-dir contract (a bucket == n would write
        a phantom shard)."""
        import hashlib
        import math

        u = int(hashlib.md5(f"shard7|{key}".encode()).hexdigest()[:8], 16) / 2**32
        b = math.floor(u * n)
        assert 0 <= b < n
