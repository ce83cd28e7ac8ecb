"""Model-based property test of SnapshotTable write semantics.

Hypothesis drives a random sequence of merge / append-new-keys /
overwrite / compact / noop operations against a SnapshotTable and, in
lockstep, against a plain Python dict model of the same contract:

* merge  — keyed upsert where a NULL incoming value preserves the
  existing one (the reference's NaN-dropping ``SET n +=``,
  pipeline/auradb_loader.py:170-189);
* append — new rows only (the caller contract: known-new keys);
* overwrite — full replace;
* compact / noop — content-identical maintenance commits.

After the sequence, the table's live rows must equal the model exactly,
and EVERY intermediate version must still time-travel back to the state
the model had at that step — the storage layer's whole history, not
just HEAD, stays faithful under arbitrary operation interleavings.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oak_knowledge_graph_neo4j_auradb_spark.plans.snapshots import SnapshotTable

_KEYS = st.sampled_from([f"k{i}" for i in range(8)])
_VALS = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))
_ROW = st.tuples(_KEYS, _VALS, _VALS)

_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("merge"), st.lists(_ROW, min_size=1, max_size=4)),
        st.tuples(st.just("append"), st.lists(_ROW, min_size=1, max_size=3)),
        st.tuples(st.just("overwrite"), st.lists(_ROW, min_size=0, max_size=4)),
        st.tuples(st.just("compact"), st.just(None)),
        st.tuples(st.just("noop"), st.just(None)),
    ),
    min_size=1,
    max_size=6,
)

_SCHEMA = "id string, a int, b int"


def _table_state(df) -> dict:
    return {r["id"]: (r["a"], r["b"]) for r in df.collect()}


def test_snapshot_table_matches_dict_model(spark, tmp_path_factory):
    counter = [0]

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(_OPS)
    def run(ops):
        counter[0] += 1
        base = tmp_path_factory.mktemp(f"prop{counter[0]}")
        t = SnapshotTable(spark, str(base / "t"))
        t.create(
            spark.createDataFrame([("k0", 1, 1), ("k1", None, 2)], _SCHEMA),
            keys="id",
            n_buckets=4,
        )
        model = {"k0": (1, 1), "k1": (None, 2)}
        history = [dict(model)]  # model state as of each version

        for op, rows in ops:
            if op == "merge":
                # dedup within the batch like the table does (keyed)
                batch = {k: (a, b) for k, a, b in rows}
                t.merge(
                    spark.createDataFrame(
                        [(k, a, b) for k, (a, b) in batch.items()], _SCHEMA
                    )
                )
                for k, (a, b) in batch.items():
                    olda, oldb = model.get(k, (None, None))
                    model[k] = (
                        a if a is not None else olda,
                        b if b is not None else oldb,
                    )
            elif op == "append":
                # caller contract: append only known-new keys
                batch = {
                    k: (a, b) for k, a, b in rows if k not in model
                }
                if not batch:
                    t.noop()
                else:
                    t.append(
                        spark.createDataFrame(
                            [(k, a, b) for k, (a, b) in batch.items()],
                            _SCHEMA,
                        )
                    )
                    model.update(batch)
            elif op == "overwrite":
                batch = {k: (a, b) for k, a, b in rows}
                t.overwrite(
                    spark.createDataFrame(
                        [(k, a, b) for k, (a, b) in batch.items()], _SCHEMA
                    )
                )
                model = dict(batch)
            elif op == "compact":
                # compact with nothing fragmented does not commit — pad
                # with a noop so version == model-history index stays true
                before = t.current_version()
                if t.compact().version == before:
                    t.noop("compact-noop")
            else:
                t.noop()
            history.append(dict(model))

        assert _table_state(t.read()) == model
        # every version time-travels to the model's state at that step
        for v, state in enumerate(history):
            assert _table_state(t.read(as_of=v)) == state, f"as_of={v}"
        # manifest row counts stay truthful at every version
        for v, state in enumerate(history):
            assert t.snapshot(v).n_rows == len(state), f"n_rows v{v}"

    run()
