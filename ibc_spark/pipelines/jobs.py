"""Job-spec dispatcher — the engine's face of the reference's three
``workflow_dispatch`` CI jobs (``upload-staffing-roster.yml:3-18``,
``upload-projects.yml:3-18``, ``end-semester.yml:3-12``).

The reference orchestrates each pipeline as a manually-dispatched GitHub
Actions job with an ``environment`` choice (dev/prod) plus ``web_app_url``
and ``sheet_name`` runtime inputs, delivered to the script as env vars.
Here the same contract is a committed YAML spec under ``conf/jobs/``:

    job: upload-staffing-roster
    entry: ibc_spark.pipelines.staffing_roster
    inputs:
      url:        { env: WEB_APP_URL, required: true }
      sheet_name: { env: SHEET_NAME, default: "Staffing Roster" }
    environments:
      dev:  { master: "local[*]",  state_dir: ./state/dev,  output: ./out/dev }
      prod: { master: "local[32]", state_dir: ./state/prod, output: ./out/prod,
              conf: { spark.sql.shuffle.partitions: "32" } }

``resolve_job`` merges the chosen environment overlay and env-var inputs
into a fully-resolved run; ``spark_submit_argv`` renders it as the
``spark-submit`` command the scheduler executes. The dispatcher main
(``python -m ibc_spark.pipelines.jobs --config ... --environment dev
[--dry-run]``) prints the command (dry-run) or executes the pipeline main
in-process — the pipelines themselves keep their own arg/env contract
(``pipelines/cli.py``), so a job spec adds orchestration without forking
configuration.
"""

from __future__ import annotations

import argparse
import os
import sys
from dataclasses import dataclass, field

from ibc_spark.errors import InvalidFormatError

_KNOWN_ENTRIES = {
    "ibc_spark.pipelines.staffing_roster",
    "ibc_spark.pipelines.projects",
    "ibc_spark.pipelines.end_semester",
}


@dataclass
class JobSpec:
    """A fully-resolved pipeline run."""

    job: str
    entry: str
    environment: str
    master: str
    state_dir: str | None
    output: str | None
    inputs: dict[str, str] = field(default_factory=dict)
    conf: dict[str, str] = field(default_factory=dict)


def resolve_job(
    path: str,
    environment: str,
    *,
    env: dict[str, str] | None = None,
) -> JobSpec:
    """Load a YAML job spec and resolve the given environment overlay.

    Input values come from the process environment (the reference's
    workflow-input → env-var delivery) or the spec's defaults; a required
    input with no value raises E003 (InvalidFormatError), mirroring the
    reference's fail-at-startup on missing config.
    """
    import yaml

    env = os.environ if env is None else env
    try:
        with open(path) as fh:
            doc = yaml.safe_load(fh)
    except OSError as e:
        raise InvalidFormatError(f"cannot read job spec {path}: {e}") from e
    except yaml.YAMLError as e:
        raise InvalidFormatError(f"job spec {path} is not valid YAML: {e}") from e
    if not isinstance(doc, dict):
        raise InvalidFormatError(f"job spec {path} must be a mapping")
    for key in ("job", "entry", "environments"):
        if key not in doc:
            raise InvalidFormatError(f"job spec {path} is missing '{key}'")
    if doc["entry"] not in _KNOWN_ENTRIES:
        raise InvalidFormatError(
            f"unknown entry {doc['entry']!r}; expected one of {sorted(_KNOWN_ENTRIES)}"
        )
    envs = doc["environments"]
    if environment not in envs:
        raise InvalidFormatError(
            f"environment {environment!r} not in {sorted(envs)} for job {doc['job']}"
        )
    overlay = envs[environment] or {}

    inputs: dict[str, str] = {}
    for name, spec in (doc.get("inputs") or {}).items():
        spec = spec or {}
        value = env.get(spec.get("env", ""), None) if spec.get("env") else None
        if value is None:
            value = spec.get("default")
        if value is None and spec.get("required"):
            raise InvalidFormatError(
                f"required input {name!r} unset (env {spec.get('env')!r}) "
                f"for job {doc['job']}"
            )
        if value is not None:
            inputs[name] = str(value)

    return JobSpec(
        job=str(doc["job"]),
        entry=str(doc["entry"]),
        environment=environment,
        master=str(overlay.get("master", "local[*]")),
        state_dir=overlay.get("state_dir"),
        output=overlay.get("output"),
        inputs=inputs,
        conf={str(k): str(v) for k, v in (overlay.get("conf") or {}).items()},
    )


def spark_submit_argv(spec: JobSpec) -> list[str]:
    """Render the resolved job as a RUNNABLE spark-submit command line.

    spark-submit takes an application FILE, not a ``-m`` module flag
    (that is a python-interpreter flag), so the entry module is resolved
    to its source path without importing it, and the repo root is put on
    PYTHONPATH for the client-mode driver (``env`` prefix) and the
    executors (``spark.executorEnv``) so ``import ibc_spark`` resolves on
    both sides."""
    import importlib.util
    from pathlib import Path

    origin = importlib.util.find_spec(spec.entry)
    if origin is None or origin.origin is None:
        raise InvalidFormatError(f"entry module {spec.entry!r} has no source file")
    # repo root = the directory CONTAINING the entry's top-level package —
    # located via the top package's own spec rather than a fixed parents[N]
    # hop from the entry file (which silently broke for entries not exactly
    # three levels deep, e.g. `ibc_spark.main` or a deeper subpackage).
    top = importlib.util.find_spec(spec.entry.split(".")[0])
    if top is None:
        raise InvalidFormatError(f"entry module {spec.entry!r} has no top package")
    if top.submodule_search_locations:
        repo_root = str(Path(list(top.submodule_search_locations)[0]).resolve().parent)
    elif top.origin:
        repo_root = str(Path(top.origin).resolve().parent)
    else:  # pragma: no cover — namespace package with no locations
        raise InvalidFormatError(f"cannot locate package root for {spec.entry!r}")
    argv = [
        "env",
        f"PYTHONPATH={repo_root}",
        "spark-submit",
        "--master",
        spec.master,
        "--conf",
        f"spark.executorEnv.PYTHONPATH={repo_root}",
    ]
    for key in sorted(spec.conf):
        argv += ["--conf", f"{key}={spec.conf[key]}"]
    argv.append(origin.origin)
    return argv + pipeline_argv(spec)


def pipeline_argv(spec: JobSpec) -> list[str]:
    """The pipeline-main arguments (shared by dry-run and in-process run)."""
    argv: list[str] = []
    if "url" in spec.inputs:
        argv += ["--url", spec.inputs["url"]]
    if "sheet_name" in spec.inputs:
        argv += ["--sheet-name", spec.inputs["sheet_name"]]
    if spec.state_dir:
        argv += ["--state-dir", spec.state_dir]
    if spec.output:
        argv += ["--output", spec.output]
    argv += ["--master", spec.master]
    return argv


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="ibc_spark.pipelines.jobs",
        description="dispatch a conf/jobs/*.yaml pipeline job",
    )
    p.add_argument("--config", required=True, help="path to a conf/jobs/*.yaml spec")
    p.add_argument("--environment", default="dev", help="environment overlay name")
    p.add_argument(
        "--dry-run",
        action="store_true",
        help="print the resolved spark-submit command and exit",
    )
    args = p.parse_args(argv)
    spec = resolve_job(args.config, args.environment)
    if args.dry_run:
        print(" ".join(spark_submit_argv(spec)))
        return 0
    import importlib

    mod = importlib.import_module(spec.entry)
    return int(mod.main(pipeline_argv(spec)) or 0)


if __name__ == "__main__":
    sys.exit(main())
