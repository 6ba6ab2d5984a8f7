#!/usr/bin/env bash
# Kaldi-style option parser: turns `--some-flag value` into `some_flag=value`
# for variables already declared in the calling script (same contract as the
# reference tools/parse_options.sh).

while true; do
  [ -z "${1:-}" ] && break
  case "$1" in
    --*)
      name=$(echo "$1" | sed 's/^--//; s/-/_/g')
      # must already exist
      eval '[ -z "${'"$name"'+x}" ]' && \
        echo "$0: invalid option $1" >&2 && exit 1
      [ -z "${2:-}" ] && echo "$0: missing value for $1" >&2 && exit 1
      eval "$name=\"\$2\""
      shift 2
      ;;
    *) break ;;
  esac
done
true
