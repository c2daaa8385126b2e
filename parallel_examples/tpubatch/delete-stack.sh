#!/bin/bash
# Tear down the tpubatch GCP infrastructure. Analogue of the reference's
# delete-stack.sh (parallel_examples/awsbatch/delete-stack.sh). The
# bucket has force_destroy=true, so any leftover tile intermediates are
# removed with it.

set -euo pipefail

if [[ -z "${GCP_PROJECT:-}" ]]; then
    echo "Must set GCP_PROJECT first" >&2
    exit 1
fi
GCP_REGION="${GCP_REGION:-us-central1}"

cd "$(dirname "$0")/template"
terraform destroy -input=false \
    -var "project=${GCP_PROJECT}" -var "region=${GCP_REGION}" "$@"
