#!/bin/bash
# Apply template changes to an existing stack. Analogue of the
# reference's modify-stack.sh (parallel_examples/awsbatch/
# modify-stack.sh); with Terraform this is simply another apply — the
# plan shows exactly what changes before anything is touched.

set -euo pipefail

if [[ -z "${GCP_PROJECT:-}" ]]; then
    echo "Must set GCP_PROJECT first" >&2
    exit 1
fi
GCP_REGION="${GCP_REGION:-us-central1}"

cd "$(dirname "$0")/template"
terraform apply -input=false \
    -var "project=${GCP_PROJECT}" -var "region=${GCP_REGION}" "$@"
