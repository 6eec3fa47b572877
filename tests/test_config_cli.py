"""Config loader + threshold-wiring tests (reference test_config_loader.py analog)."""

import pytest

from webextract.config import (
    ExtractorConfig,
    OrchestratorConfig,
    PipelineConfig,
    load_pipeline_config,
)
from webextract.extract import extract_document


def test_defaults():
    cfg = PipelineConfig()
    assert cfg.extractor.link_density_max == 0.5
    assert cfg.orchestrator.n_buckets == 64
    assert cfg.exporter.table_format == "parquet"


def test_yaml_roundtrip(tmp_path):
    (tmp_path / "extractor.yaml").write_text("link_density_max: 0.7\n")
    (tmp_path / "orchestrator.yaml").write_text("n_buckets: 16\nwaves: 4\n")
    cfg = load_pipeline_config(str(tmp_path))
    assert cfg.extractor.link_density_max == 0.7
    assert cfg.orchestrator.n_buckets == 16
    assert cfg.orchestrator.waves == 4
    assert cfg.evaluation.len_tolerance == 0.02  # absent file → defaults


def test_empty_file_gives_defaults(tmp_path):
    (tmp_path / "extractor.yaml").write_text("")
    cfg = load_pipeline_config(str(tmp_path))
    assert cfg.extractor == ExtractorConfig()


def test_missing_file_raises_when_required(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_pipeline_config(str(tmp_path), require_all=True)


def test_unknown_key_raises(tmp_path):
    (tmp_path / "orchestrator.yaml").write_text("max_workers: 4\n")  # reference knob, not ours
    with pytest.raises(Exception):
        load_pipeline_config(str(tmp_path))


def test_validation_bounds():
    with pytest.raises(Exception):
        ExtractorConfig(link_density_max=1.5)
    with pytest.raises(Exception):
        OrchestratorConfig(n_buckets=0)


def test_thresholds_change_extraction():
    """A link-bearing paragraph under the default threshold survives, but is
    dropped when the run configures a stricter link-density cap."""
    html = (b"<html><body><p>Plain long paragraph with one "
            b'<a href="/x">link word</a> inside and lots of other text.</p>'
            b"</body></html>")
    assert extract_document(html).text != ""
    assert extract_document(html, link_density_max=0.05).text == ""
