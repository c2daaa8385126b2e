# Infrastructure template for the pyshepseg_tpu batch pipeline on GCP —
# the analogue of the reference's CloudFormation template
# (parallel_examples/awsbatch/template/template.yaml: VPC + Batch compute
# environment + queue + job definitions for EC2 CPU workers).
#
# Creates: the object-store bucket (data plane), a worker service
# account with access to it, and an Artifact Registry repository for the
# worker image (parallel_examples/tpubatch/Dockerfile). Cloud Batch jobs
# themselves are submitted per scene by submit_pyshepseg_job.py
# --backend gcpbatch, which emits job specs that reference these
# resources and request TPU-VM machine types.
#
#   terraform init && terraform apply \
#       -var project=my-project -var region=us-central1

variable "project" { type = string }
variable "region" {
  type    = string
  default = "us-central1"
}
variable "bucket_name" {
  type        = string
  default     = ""
  description = "Object-store bucket; default derives from the project"
}

provider "google" {
  project = var.project
  region  = var.region
}

locals {
  bucket = var.bucket_name != "" ? var.bucket_name : "${var.project}-pyshepseg-tpu"
}

# Data plane: prepare.pkl, per-tile rasters, and final outputs
# (ObjectStore gs:///s3:///file:// — see objstore.py)
resource "google_storage_bucket" "store" {
  name                        = local.bucket
  location                    = var.region
  uniform_bucket_level_access = true
  force_destroy               = true

  lifecycle_rule {
    # tile intermediates are re-creatable from the source scene; expire
    # anything a failed job left behind
    condition { age = 14 }
    action { type = "Delete" }
  }
}

# Worker image registry
resource "google_artifact_registry_repository" "images" {
  repository_id = "pyshepseg-tpu"
  format        = "DOCKER"
  location      = var.region
}

# Identity the Batch jobs run as
resource "google_service_account" "worker" {
  account_id   = "pyshepseg-tpu-worker"
  display_name = "pyshepseg_tpu batch worker"
}

resource "google_storage_bucket_iam_member" "worker_rw" {
  bucket = google_storage_bucket.store.name
  role   = "roles/storage.objectAdmin"
  member = "serviceAccount:${google_service_account.worker.email}"
}

resource "google_project_iam_member" "worker_batch" {
  project = var.project
  role    = "roles/batch.agentReporter"
  member  = "serviceAccount:${google_service_account.worker.email}"
}

output "store_url" {
  value = "gs://${google_storage_bucket.store.name}"
}
output "image_repo" {
  value = "${var.region}-docker.pkg.dev/${var.project}/${google_artifact_registry_repository.images.repository_id}"
}
output "worker_service_account" {
  value = google_service_account.worker.email
}
