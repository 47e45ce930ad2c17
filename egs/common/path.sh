# Make the in-tree package importable — the analogue of the reference's
# egs/<corpus>/voc1/path.sh (venv activation + PYTHONPATH). Appending (not
# overwriting) matters: TPU runtime plugins may already live on PYTHONPATH.
_repo_root="$(cd "$(dirname "${BASH_SOURCE[0]}")/../.." && pwd)"
case ":${PYTHONPATH:-}:" in
    *":${_repo_root}:"*) ;;
    *) export PYTHONPATH="${_repo_root}${PYTHONPATH:+:${PYTHONPATH}}" ;;
esac
