"""Pipeline-level fixture tests (SURVEY §5.2) — every reference branch."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests import fixtures


def _by(df, col, val):
    return {r[col]: r.asDict() for r in df.collect()}.get(val)


class TestStaffingRoster:
    def _run(self, spark):
        from ibc_spark.pipelines import staffing_roster

        return staffing_roster.run(
            fixtures.roster_df(spark),
            fixtures.users_state(spark),
            fixtures.consultants_state(spark),
        )

    def test_metrics(self, spark):
        m = self._run(spark).metrics.collect()[0]
        # 5 rows: 2 invalid; 3 valid but alice duplicated → 2 surviving
        assert m["invalid_rows"] == 2
        assert m["valid_rows"] == 2

    def test_quarantine_reasons(self, spark):
        q = {r["reason"] for r in self._run(spark).quarantine.collect()}
        assert "Missing required columns: major" in q
        assert "Missing required columns: name" in q

    def test_duplicate_email_last_wins(self, spark):
        users = self._run(spark).users
        alice = _by(users, "email", "alice@x.edu")
        assert alice["name"] == "Alice A2"
        assert alice["curr_role"] == "SC"
        assert alice["us_citizen"] is False  # 'maybe' → junk → false

    def test_update_path_keeps_key(self, spark):
        users = self._run(spark).users
        bob = _by(users, "email", "bob@x.edu")
        assert bob["user_id"] == 100  # existing surrogate key survives
        assert bob["name"] == "Bob Old"
        assert bob["us_citizen"] is False  # '0'
        assert bob["residency"] is True  # 'TRUE'
        assert bob["first_gen"] is False  # '' → junk → false

    def test_untouched_users_pass_through(self, spark):
        users = self._run(spark).users
        assert _by(users, "email", "dana@x.edu")["name"] == "Dana D"

    def test_availability_bitstrings(self, spark):
        res = self._run(spark)
        alice_uid = _by(res.users, "email", "alice@x.edu")["user_id"]
        cons = _by(res.consultants, "user_id", alice_uid)
        # LAST alice row wins wholesale (sequential parity): slot 1 tuesday only
        assert cons["availability_tue"] == "1" + "0" * 29
        assert cons["availability_mon"] == "0" * 30
        # updated existing consultant: no slots → all zeros
        bob_cons = _by(res.consultants, "user_id", 100)
        assert bob_cons["availability_mon"] == "0" * 30
        assert bob_cons["semesters_in_ibc"] == 3

    def test_first_row_availability_parsing(self, spark):
        """A2 semantics on the winning-row-only frame: day lists, trim,
        case-insensitivity, unknown-day drop."""
        from ibc_spark.ops.reshape import availability_pivot
        from ibc_spark.io_.sources import dataframe_from_rows

        rows = [fixtures.roster_rows()[0]]
        df = dataframe_from_rows(spark, rows).withColumn("_k", F.lit(1))
        out = availability_pivot(df, key="_k").collect()[0]
        mon = out["availability_mon"]
        wed = out["availability_wed"]
        fri = out["availability_fri"]
        assert mon[0] == "1" and wed[0] == "1"  # slot 1 "Monday, Wednesday"
        assert fri[1] == "1"  # slot 2 " Friday " trimmed
        assert fri[29] == "1"  # slot 30 "friday" case-folded; "Funday" ignored
        assert mon.count("1") == 1 and wed.count("1") == 1 and fri.count("1") == 2


class TestProjects:
    def _run(self, spark):
        from ibc_spark.pipelines import projects as pp

        return pp.run(
            fixtures.projects_df(spark),
            fixtures.users_state(spark),
            fixtures.consultants_state(spark),
            fixtures.projects_state(spark),
        )

    def test_metrics_and_quarantine(self, spark):
        res = self._run(spark)
        m = res.metrics.collect()[0]
        assert m["valid_rows"] == 3  # new, identical-resubmit, changed-resubmit
        assert m["invalid_rows"] == 2  # missing name + dangling netid
        reasons = {r["reason"] for r in res.quarantine.collect()}
        assert "Missing required columns: project_name" in reasons
        assert "NetID 'ghost9' for role SM not found in database" in reasons

    def test_new_project_inserted_with_resolved_roles(self, spark):
        res = self._run(spark)
        p = _by(res.projects, "project_name", "New Project")
        assert p is not None
        assert p["em_id"] == 103 and p["sm_id"] == 101 and p["pm_id"] == 102
        assert p["sc1_id"] == 104 and p["sc2_id"] == 100
        assert p["project_id"] is not None

    def test_unchanged_resubmission_skipped(self, spark):
        res = self._run(spark)
        p = _by(res.projects, "project_name", "Existing Project")
        assert p["project_id"] == 9000
        assert p["client_name"] == "ACME"  # untouched

    def test_changed_resubmission_updated(self, spark):
        res = self._run(spark)
        p = _by(res.projects, "project_name", "Changed Project")
        assert p["project_id"] == 9001  # key survives
        assert p["client_name"] == "NewCo"
        assert p["sm_id"] is None  # new row's NULL overwrites? no — coalesce keeps old
        # NOTE: merge semantics coalesce(new, old) keep old value when new is NULL

    def test_role_reconciliation(self, spark):
        res = self._run(spark)
        users = {r["user_id"]: r.asDict() for r in res.users.collect()}
        assert users[101]["curr_role"] == "SM"  # dana SC → SM
        assert users[102]["curr_role"] == "PM"  # eve NC → PM
        assert users[103]["curr_role"] == "EM"  # finn unchanged
        assert users[104]["curr_role"] == "SC"  # gail NC → SC
        assert users[100]["curr_role"] == "SC"  # bob NC → SC (sc2 of new project)

    def test_returning_marks_exclude_em(self, spark):
        res = self._run(spark)
        cons = {r["user_id"]: r.asDict() for r in res.consultants.collect()}
        assert cons[101]["status"] == "returning"  # SM of new project
        assert cons[102]["status"] == "returning"  # PM
        assert cons[104]["status"] == "returning"  # SC1
        assert cons[100]["status"] == "returning"  # SC2
        # EM (103) has no consultants row; and untouched rows keep status

    def test_links_only_for_new_projects_include_em(self, spark):
        res = self._run(spark)
        links = [(r["user_id"], r["role"]) for r in res.links.collect()]
        assert (103, "EM") in links
        assert (101, "SM") in links and (102, "PM") in links
        assert (104, "SC") in links and (100, "SC") in links
        assert len(links) == 5  # nothing from resubmissions


class TestEndSemester:
    def test_bulk_mutation(self, spark):
        from ibc_spark.pipelines import end_semester

        res = end_semester.run(fixtures.consultants_state(spark))
        rows = res.consultants.collect()
        assert all(r["status"] == "Deferred" for r in rows)
        sem = {r["user_id"]: r["semesters_in_ibc"] for r in rows}
        assert sem[100] == 4 and sem[101] == 6
        assert res.metrics.collect()[0]["rows_updated"] == len(rows)
