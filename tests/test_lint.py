"""Lint gate — the reference's pre-commit layer equivalent
(/root/reference/.pre-commit-config.yaml:30-63 runs clang-format+cpplint;
this environment has no lint binaries, so tools/lint.py implements the
checks and this test enforces them in CI)."""
import os

from fast_lio_sam_qn_tpu.tools.lint import lint_paths

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_repo_is_lint_clean():
    paths = [os.path.join(REPO, p) for p in
             ("fast_lio_sam_qn_tpu", "tests", "bench.py",
              "__graft_entry__.py")]
    errors = lint_paths(paths)
    assert not errors, "\n".join(errors)
