"""Metrics JSONL logger."""

from sln_tpu.train.metrics import MetricsLogger, read_metrics, summarize


def test_metrics_roundtrip(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = MetricsLogger(path)
    for t in range(5):
        log.log(t, total_loss=10.0 - t, lr=1e-4)
    log.close()
    recs = read_metrics(path)
    assert len(recs) == 5
    assert recs[0]["total_loss"] == 10.0
    s = summarize(recs, "total_loss")
    assert s["first"] == 10.0 and s["last"] == 6.0 and s["count"] == 5


def test_metrics_disabled():
    log = MetricsLogger(None)
    log.log(0, loss=1.0)   # no-op, no crash
    log.close()
