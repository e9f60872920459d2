
CREATE TABLE tbl_clientes (id BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY, nome_razao_social VARCHAR(255), nome_fantasia VARCHAR(255), cpf_cnpj VARCHAR(18) NOT NULL UNIQUE, data_nascimento DATE, data_cadastro TIMESTAMP);
CREATE TABLE tbl_planos (id INT GENERATED ALWAYS AS IDENTITY PRIMARY KEY, descricao VARCHAR(255) NOT NULL UNIQUE, valor DECIMAL(15,2));
CREATE TABLE tbl_status_contrato (id INT PRIMARY KEY, status VARCHAR(255));
CREATE TABLE tbl_tipos_contato (id INT PRIMARY KEY, tipo_contato VARCHAR(255));
CREATE TABLE tbl_cliente_contratos (id BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY, cliente_id BIGINT, plano_id INT, dia_vencimento INT, isento BOOLEAN, endereco_logradouro VARCHAR(255), endereco_numero VARCHAR(255), endereco_bairro VARCHAR(255), endereco_cidade VARCHAR(255), endereco_complemento VARCHAR(255), endereco_cep VARCHAR(255), endereco_uf VARCHAR(2), status_id INT);
CREATE TABLE tbl_cliente_contatos (id BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY, cliente_id BIGINT, tipo_contato_id INT, contato VARCHAR(255));
INSERT INTO tbl_status_contrato VALUES (1,'Ativo'),(2,'Velocidade Reduzida'),(3,'Suspenso'),(4,'Cancelado');
INSERT INTO tbl_tipos_contato VALUES (1,'Telefone'),(2,'Celular'),(3,'E-Mail');
