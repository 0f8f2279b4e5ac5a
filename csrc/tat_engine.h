/* C ABI for the thingino-accel-tpu engine.
 *
 * Mirrors the reference's public model API call shapes
 * (/root/reference/include/nna_model.h:45-116: nna_model_load /
 * get_input / get_output / run / unload and the tensor accessors from
 * include/nna_tensor.h) over the TPU engine. The implementation embeds
 * CPython and drives thingino_accel_tpu.runtime.Engine; a C host links
 * against libtat_engine.so + libpython.
 */
#ifndef TAT_ENGINE_H
#define TAT_ENGINE_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct tat_model tat_model_t;
typedef struct tat_tensor tat_tensor_t;

enum {
  TAT_SUCCESS = 0,
  TAT_ERROR_INVALID_PARAM = -1,
  TAT_ERROR_FILE_NOT_FOUND = -2,
  TAT_ERROR_RUNTIME = -3,
};

/* Bring-up / teardown (the nna_init/nna_deinit role; on TPU this
 * initializes the embedded interpreter + JAX runtime). */
int tat_init(void);
void tat_deinit(void);

/* Model lifecycle (nna_model_load/run/unload call shapes). */
tat_model_t *tat_model_load(const char *path);
int tat_model_run(tat_model_t *model);
void tat_model_unload(tat_model_t *model);

/* IO introspection + buffers (nna_model_get_input/get_output +
 * nna_tensor accessors). Tensor data lives in host buffers owned by
 * the model; write inputs before run, read outputs after. */
int tat_model_num_inputs(tat_model_t *model);
int tat_model_num_outputs(tat_model_t *model);
tat_tensor_t *tat_model_get_input(tat_model_t *model, uint32_t index);
tat_tensor_t *tat_model_get_output(tat_model_t *model, uint32_t index);

const char *tat_tensor_name(const tat_tensor_t *t);
int tat_tensor_ndim(const tat_tensor_t *t);
const int64_t *tat_tensor_shape(const tat_tensor_t *t);
int64_t tat_tensor_bytes(const tat_tensor_t *t);
/* dtype as the numpy dtype NAME string ("int8", "float32", ...). */
const char *tat_tensor_dtype(const tat_tensor_t *t);
void *tat_tensor_data(tat_tensor_t *t);

/* Last error message (static buffer, valid until the next call). */
const char *tat_last_error(void);

int tat_engine_abi_version(void);

#ifdef __cplusplus
}
#endif

#endif /* TAT_ENGINE_H */
