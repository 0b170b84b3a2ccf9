"""GTP CLI driven end-to-end through a subprocess pipe (CPU backend)."""

import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")


def run_gtp(commands: str) -> list[str]:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "scripts/play_cli.py", "--cpu"],
        input=commands,
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout.splitlines()


def test_gtp_session_plays_a_full_game():
    lines = run_gtp(
        "protocol_version\n"
        "name\n"
        "boardsize 3\n"
        "play b a1\n"
        "genmove w\n"
        "showboard\n"
        "final_score\n"
        "list_commands\n"
        "quit\n"
    )
    text = "\n".join(lines)
    # GTP success responses start with "=", failures with "?"
    assert "= 2" in text  # protocol_version
    assert any(l.startswith("= ") and "hex" in l.lower() for l in lines)  # name
    assert "?" not in [l[:1] for l in lines if l]  # no command failed
    assert "genmove" in text or any(  # engine answered with a coordinate
        l.startswith("= ") and len(l.split()) == 2 and l.split()[1][0].isalpha()
        and l.split()[1][1:].isdigit()
        for l in lines
    )


def test_gtp_rejects_illegal_and_scores_win():
    lines = run_gtp(
        "boardsize 3\n"
        "play b a1\n"
        "play w a1\n"   # occupied -> must be rejected
        "play b b1\n"
        "play w a2\n"
        "play b c1\n"   # b connects top-bottom column-wise? (engine decides)
        "final_score\n"
        "quit\n"
    )
    # the illegal replay at a1 must produce a "?" failure line
    assert any(l.startswith("?") for l in lines), lines
