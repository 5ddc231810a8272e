"""Semantics pins for driver-facing entry queries (entry_queries.py).

Plan-shape assertions for the same queries live in test_plans.py; these
pin the row-level rules on hand-built fixtures."""


class TestBestOfNSemantics:
    def test_selection_stats_and_accept_gate(self, spark, tmp_path):
        """Pins the best-of-n rules: argmax-reward response per prompt
        (tie-break earliest turn), single-response prompts KEPT (unlike
        preference_pairs), mean_reward is the integer-DIV candidate
        mean, and the accept gate is the absolute threshold
        best_reward >= 2000 (>= 2 words)."""
        from unraveldocs_spark.entry_queries import q_best_of_n

        s1 = [  # turns: u a a u a a -> prompts 0 and 3
            "what is spark",
            "short",
            "a much longer and better answer",
            "second prompt",
            "ok",  # 1 word, 2 chars -> 1002: below the gate
            "no",  # 1002: reward tie -> earliest turn (4) wins
        ]
        docs = [(100 + i, t, "s1") for i, t in enumerate(s1)]
        spark.createDataFrame(
            [(i, t, "en", s, len(t)) for i, t, s in docs],
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint",
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        rows = {
            (r["conv_id"], r["prompt_idx"]): r
            for r in q_best_of_n(spark, str(tmp_path)).collect()
        }
        assert set(rows) == {("s1", 0), ("s1", 3)}
        r0 = rows[("s1", 0)]
        # rewards: 'short' = 1005, long answer = 6031
        assert (r0["n_candidates"], r0["best_idx"], r0["best_reward"]) == (
            2, 2, 6031,
        )
        assert r0["mean_reward"] == (1005 + 6031) // 2
        assert r0["accepted"] == 1
        r3 = rows[("s1", 3)]
        # both candidates reward 1002 -> earliest turn wins, gate rejects
        assert (r3["n_candidates"], r3["best_idx"], r3["best_reward"]) == (
            2, 4, 1002,
        )
        assert r3["accepted"] == 0
