"""Regression tests for the round-3 advisor findings (ADVICE.md r3):
--artifact must reject explicitly-passed model-configuration flags instead of
silently ignoring them, and the PLASTIC_UNET_PLATFORM force must warn loudly
when a backend was already initialized (where jax.config.update no-ops).
The export chunk-streaming fix is pinned by test_export.py::
test_roundtrip_exact (N=7, chunk=4 exercises the one-in-flight loop)."""

import os
import subprocess
import sys

import pytest


class TestArtifactFlagConflicts:
    """plastic-unet-serve --artifact bakes tta/threshold/chunk/model-shape
    into the exported graph; an explicit flag alongside it must be a parser
    error, not a silent no-op (a user passing --threshold expects binary
    masks — getting probabilities and a /predict_rle 400 instead is a trap)."""

    def _main(self, argv):
        from plastic_unet_tpu.submit.http_server import main

        return main(argv)

    @pytest.mark.parametrize(
        "extra",
        [
            ["--threshold", "0.5"],
            ["--tta", "tta4"],
            ["--chunk", "64"],
            ["--nbf", "64"],
            ["--neurons", "8"],
            ["--prule", "oja"],
        ],
    )
    def test_conflicting_flag_rejected(self, extra, capsys):
        with pytest.raises(SystemExit) as exc:
            self._main(["--artifact", "/nonexistent/art"] + extra)
        assert exc.value.code == 2  # argparse parser.error
        err = capsys.readouterr().err
        assert extra[0] in err and "artifact" in err

    def test_artifact_alone_passes_validation(self):
        # No conflicting flags: validation passes and main proceeds to load
        # the artifact (which fails on the bogus path — proving we got past
        # the parser, not that serving works; serving is covered by
        # test_export.py::test_serve_from_artifact).
        with pytest.raises(FileNotFoundError):
            self._main(["--artifact", "/nonexistent/art"])

    def test_model_path_keeps_flags(self):
        # --model still accepts every flag (only parse; 'x.pth' never loads).
        from plastic_unet_tpu.submit.http_server import build_parser

        args = build_parser().parse_args(
            ["--model", "x.pth", "--threshold", "0.5", "--tta", "tta4"]
        )
        assert args.threshold == 0.5


def test_platform_force_warns_on_initialized_backend(tmp_path):
    """jax.config.update('jax_platforms', ...) silently no-ops once a backend
    is initialized — the package must detect that and fire its loud warning
    (previously the warning never fired in exactly the hazard case it
    documents: the process would keep the default backend in silence)."""
    script = tmp_path / "probe.py"
    script.write_text(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.devices()  # initialize the CPU backend\n"
        "import os\n"
        "os.environ['PLASTIC_UNET_PLATFORM'] = 'tpu'\n"
        "import plastic_unet_tpu\n"
        "print('IMPORT_OK')\n"
    )
    env = dict(os.environ)
    env.pop("PLASTIC_UNET_PLATFORM", None)
    # keep the repo AND the environment's sitecustomize on the path
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, str(script)], env=env, capture_output=True, text=True, timeout=300
    )
    assert r.returncode == 0, r.stderr
    assert "IMPORT_OK" in r.stdout
    assert "WARNING" in r.stderr and "backend" in r.stderr
