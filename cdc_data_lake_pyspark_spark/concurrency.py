"""Overlap independent Spark jobs from driver threads (guide §2.6).

Spark's scheduler happily runs several jobs at once inside one
application; actions are sequential only because driver code calls them
sequentially.  When two side-effect chains are INDEPENDENT (e.g. the
text-index save and the vector-store fit+save of a day-0 bootstrap,
or the two per-day index appends of the multimodal capstone), running
them from a small thread pool lets the later chain's tasks back-fill
executors freed by the earlier chain's tail instead of paying the full
serial sum of job walls + driver gaps.

The same pattern `pipeline.CdcPipeline.apply_changes` has used for
per-table applies since r8 — threads only drive job submission; the
cluster still schedules the work.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import SparkSession


def overlap_jobs(
    spark: SparkSession, thunks: Sequence[Callable[[], object]]
) -> list:
    """Run independent job-submitting thunks concurrently; return their
    results in order.  All thunks are joined before returning; the first
    exception in SUBMISSION order is re-raised after the join, so a
    caller never observes a half-running overlap.

    Note the caller still owns rollback of any side effects a completed
    sibling thunk committed before the failure surfaced — wrap cleanup
    in try/finally at the call site."""
    if len(thunks) <= 1:
        return [t() for t in thunks]
    from concurrent.futures import ThreadPoolExecutor

    jspark = spark._jsparkSession
    jvm = spark._jvm
    # JVM thread-local state does not cross driver threads under the
    # pinned-thread gateway: besides the active session, the caller's
    # LOCAL PROPERTIES (job description / job group — guide §1.5) must be
    # copied into each worker, or overlapped jobs lose their labels in
    # the UI/event log (ADVICE r16: profile_query's per-query stage
    # attribution silently excluded overlapped jobs).  Same clone/set
    # pair pyspark.util.inheritable_thread_target uses.
    try:
        props = spark.sparkContext._jsc.sc().getLocalProperties().clone()
    except Exception:
        props = None

    def _bound(t):
        # the active session is thread-local on the JVM side; bind the
        # shared session so code using SparkSession.getActiveSession()
        # works off-main-thread (the CdcPipeline discipline)
        jvm.SparkSession.setActiveSession(jspark)
        if props is not None:
            spark.sparkContext._jsc.sc().setLocalProperties(props)
        return t()

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(_bound, t) for t in thunks]
        # `with` joins every worker; surface the first failure (in
        # submission order) after all have settled (result() re-raises
        # per future)
        return [f.result() for f in futures]
