#!/usr/bin/env bash
# Install the pre-push quality gate (run once per clone):
#   bash scripts/install-hooks.sh
set -euo pipefail
cd "$(dirname "$0")/.."
cat > .git/hooks/pre-push <<'HOOK'
#!/usr/bin/env bash
# Pre-push gate: the full check.sh suite (import, native build, tests,
# graft-entry compile). Bypass with --no-verify for WIP pushes.
exec bash "$(git rev-parse --show-toplevel)/check.sh"
HOOK
chmod +x .git/hooks/pre-push
echo "pre-push hook installed"
