#!/usr/bin/env bash
# Install the fast CI gate as a git pre-commit hook.
set -e
repo="$(cd "$(dirname "$0")/.." && pwd)"
cat > "$repo/.git/hooks/pre-commit" <<EOF
#!/usr/bin/env bash
if git diff --cached --name-only | grep -qE "\\.(py|cpp|cc|h|toml)$"; then
    exec "$repo/tools/ci_gate.sh"
fi
echo "[ci_gate] no source files staged; skipped"
EOF
chmod +x "$repo/.git/hooks/pre-commit" "$repo/tools/ci_gate.sh"
echo "pre-commit hook installed"
